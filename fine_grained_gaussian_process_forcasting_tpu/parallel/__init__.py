from fine_grained_gaussian_process_forcasting_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated,
)
from fine_grained_gaussian_process_forcasting_tpu.parallel.sharding import (
    param_shardings,
    param_specs,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicated",
    "param_shardings",
    "param_specs",
]
