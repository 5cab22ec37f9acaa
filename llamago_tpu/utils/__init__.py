from llamago_tpu.utils.console import colorize, log  # noqa: F401
