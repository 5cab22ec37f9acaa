from llamago_tpu.checkpoint.ggjt import (  # noqa: F401
    GGJT_MAGIC,
    GGJT_VERSION,
    GGJTCheckpoint,
    read_ggjt,
    write_ggjt,
)
from llamago_tpu.checkpoint.params import (  # noqa: F401
    load_parameters,
    random_parameters,
)
