"""Device mesh / sharding helpers."""

from spmm_tpu.parallel.mesh import data_parallel_mesh, batch_sharding, replicated
from spmm_tpu.parallel.tp import dp_tp_mesh, shard_params_tp, tp_param_specs

# NOTE: parallel.sp / parallel.pp / parallel.ep are imported as submodules
# (`from spmm_tpu.parallel.ep import ...`), never re-exported here — they
# depend on models.bert, which itself imports parallel.sp, and a package-init
# re-export would close that cycle into an ImportError.

__all__ = [
    "data_parallel_mesh", "batch_sharding", "replicated",
    "dp_tp_mesh", "shard_params_tp", "tp_param_specs",
]
