"""Tensor-parallel sharding for the SPMM model family (2-D dp x tp mesh).

The reference has NO tensor parallelism — its only scaling axis is
data-parallel DDP over 8 GPUs (reference SPMM_pretrain.py:35-36; SURVEY
§2.3 "mesh design should leave room").  This module is that room, filled
in the TPU-native way: instead of rewriting the model with collective
calls (the NCCL/Megatron pattern), we annotate the *parameter pytree* with
Megatron-style ``PartitionSpec``s and let GSPMD insert the all-reduces.
The pure-functional forwards in ``models/bert.py`` run completely
unchanged on 1 device, a 1-D dp mesh, or a 2-D dp x tp mesh — the sharding
lives entirely in where ``jax.device_put`` places the weights.

Sharding rule (the classic two-matmul sandwich, applied per block):

  - attention q/k/v projections and the FFN up projection shard their
    OUTPUT dim over 'tp'  -> activations come out sharded on heads /
    FFN-hidden, with zero communication;
  - the attention out projection and the FFN down projection shard their
    INPUT (contracting) dim over 'tp' -> XLA emits one all-reduce (psum
    over ICI) per block to rebuild the replicated residual stream;
  - embeddings, LayerNorms, biases of row-sharded layers, and every task
    head stay replicated (they are tiny at this scale).

That is 2 collectives per transformer layer, riding ICI — identical in
structure to a hand-written Megatron block, but derived by the compiler
from the weight placement alone.

When to use: this 110M-param family FITS on one chip, so tp is never
needed for memory — it is a latency lever (splits every matmul's FLOPs
and the decode cache's HBM reads tp-ways) and a framework capability the
reference lacks.  Throughput-bound workloads should prefer pure dp.

Constraints: 'tp' should divide num_attention_heads (12) and
intermediate_size; ``assert_tp_compatible`` checks this.  GSPMD remains
*correct* for any tp (it reshards as needed), but non-dividing factors
add gather traffic.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import DictKey, tree_map_with_path

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.parallel.mesh import DP_AXIS

TP_AXIS = "tp"

# projections whose OUTPUT dim is sharded (column-parallel) and whose
# SIBLING ("out"/"down") contracts over the sharded dim (row-parallel)
_COL_PARALLEL = ("q", "k", "v", "up")
_ROW_PARALLEL = ("out", "down")
# parent blocks in which the rule applies (a Linear named "up" anywhere
# else in the tree — e.g. a future head — stays replicated)
_BLOCKS = ("self_attn", "cross_attn", "mlp")


def dp_tp_mesh(
    dp: Optional[int] = None,
    tp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ('dp', 'tp') mesh.  'tp' is the minor (fastest-varying) axis so
    tensor-parallel peers are ICI neighbors on a real slice; ``dp=None``
    uses every visible device."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        if len(devices) % tp:
            raise ValueError(f"{len(devices)} devices not divisible by tp={tp}")
        dp = len(devices) // tp
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DP_AXIS, TP_AXIS))


def _dict_path(path) -> list[str]:
    return [k.key for k in path if isinstance(k, DictKey)]


def _leaf_spec(path, leaf) -> P:
    keys = _dict_path(path)
    if len(keys) >= 3 and keys[-3] in _BLOCKS:
        proj, wb = keys[-2], keys[-1]
        if proj in _COL_PARALLEL:
            if wb == "w":
                return P(None, TP_AXIS)
            if wb == "b":
                return P(TP_AXIS)
        if proj in _ROW_PARALLEL and wb == "w":
            return P(TP_AXIS, None)
    return P()


def tp_param_specs(params: Any) -> Any:
    """PartitionSpec pytree mirroring ``params`` (any SPMM-family tree:
    bert encoders, mlm/task heads, full pretrain param trees)."""
    return tree_map_with_path(_leaf_spec, params)


def tp_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for ``params`` on ``mesh``."""
    return jax.tree.map(lambda s: NamedSharding(mesh, s),
                        tp_param_specs(params),
                        is_leaf=lambda x: isinstance(x, P))


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place ``params`` on ``mesh`` with the Megatron layout.  The returned
    tree feeds the *unchanged* jitted forwards/train steps; GSPMD
    propagates the layout and inserts the per-block all-reduces."""
    return jax.device_put(params, tp_shardings(params, mesh))


def assert_tp_compatible(cfg: BertArchConfig, tp: int) -> None:
    if cfg.num_attention_heads % tp:
        raise ValueError(
            f"tp={tp} does not divide num_attention_heads="
            f"{cfg.num_attention_heads}; attention-head sharding would "
            "force GSPMD resharding every layer")
    if cfg.intermediate_size % tp:
        raise ValueError(
            f"tp={tp} does not divide intermediate_size="
            f"{cfg.intermediate_size}")
