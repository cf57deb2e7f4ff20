"""Device mesh / sharding helpers."""

from spmm_tpu.parallel.mesh import data_parallel_mesh, batch_sharding, replicated

__all__ = ["data_parallel_mesh", "batch_sharding", "replicated"]
