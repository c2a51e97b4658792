from vfmseg_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    param_shardings,
    replicate,
)

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicate"]
