from llamago_tpu.parallel.mesh import make_mesh  # noqa: F401
from llamago_tpu.parallel.sharding import (  # noqa: F401
    cache_sharding,
    param_shardings,
)
