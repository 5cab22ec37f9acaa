from llamago_tpu.runtime.kv_cache import KVCache  # noqa: F401
