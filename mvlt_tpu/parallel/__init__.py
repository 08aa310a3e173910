from mvlt_tpu.parallel.mesh import build_mesh
from mvlt_tpu.parallel.partition import (batch_sharding, param_shardings,
                                         partition_spec_for_path)

__all__ = ["build_mesh", "param_shardings", "batch_sharding",
           "partition_spec_for_path"]
