"""Device mesh / sharding helpers."""

from spmm_tpu.parallel.mesh import data_parallel_mesh, batch_sharding, replicated
from spmm_tpu.parallel.tp import dp_tp_mesh, shard_params_tp, tp_param_specs

__all__ = [
    "data_parallel_mesh", "batch_sharding", "replicated",
    "dp_tp_mesh", "shard_params_tp", "tp_param_specs",
]
