from llamago_tpu.server.api import JobServer  # noqa: F401
