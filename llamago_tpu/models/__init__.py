from llamago_tpu.models.llama import forward  # noqa: F401
