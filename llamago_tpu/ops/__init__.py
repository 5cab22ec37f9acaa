from llamago_tpu.ops.basic import apply_rope, linear, rms_norm  # noqa: F401
