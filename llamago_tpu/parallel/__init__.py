from llamago_tpu.parallel.mesh import (  # noqa: F401
    initialize_distributed,
    make_mesh,
)
from llamago_tpu.parallel.sharding import (  # noqa: F401
    cache_sharding,
    param_shardings,
)
