"""Fully-sharded data parallelism (ZeRO-3) for the SPMM family.

The reference has NO parameter sharding of any kind — plain DDP replicates
params, grads, optimizer state and EMA on all 8 GPUs (reference
SPMM_pretrain.py:35-36; SURVEY §2.3 row "ZeRO/FSDP sharding: NO").  This
module is the TPU-native ZeRO-3: instead of the torch-FSDP pattern
(module wrappers, explicit all_gather hooks, flat-param bookkeeping), we
shard every *state leaf* — params, EMA twins, both Adam moments — over a
dedicated ``fsdp`` mesh axis via ``PartitionSpec`` placement and let GSPMD
derive the gather/reduce-scatter schedule.  The model code and the
pretrain step run completely unchanged: ``make_pretrain_step``'s
``shard_map`` is manual over 'dp' only, so the 'fsdp' axis stays under the
compiler exactly the way 'tp' does (training/pretrain.py:487-492).

Layout rule: each leaf shards its LARGEST dim that divides the fsdp
extent (ties go to the later dim, which is minor and usually
feature-sized); leaves with no dividing dim stay replicated (scalars,
tiny odd-shaped vectors like the 53-dim property stats).  Unlike the
Megatron specs in parallel/tp.py — which are chosen so activations stay
sharded through a block — FSDP specs are chosen purely for memory: at-rest
state is ~1/fsdp per device, and the compiler materializes whole weights
only around their use.

Memory math at the real scale (110M params, fp32): params + EMA + mu + nu
≈ 1.76 GB replicated; on a dp=2 x fsdp=4 v5e-8 the at-rest copy drops to
~440 MB/chip — the headroom that lets the per-device batch climb toward
the reference's 96 (reference SPMM_pretrain.py:16) without remat or accum.

Composition contract (mirrors tp):
  - batch arrays shard over 'dp' (shard_map in_specs) — per-dp-shard
    in-batch negatives and rng folds depend ONLY on the dp extent, so a
    dp=D x fsdp=F run is numerically identical to a 1-D dp=D run
    (tests/test_fsdp.py::test_pretrain_step_dp_fsdp_matches_dp);
  - --zero1 is redundant under fsdp (ZeRO-3 ⊃ ZeRO-1) and rejected by the
    same guard that rejects zero1+tp (training/pretrain.py:494-498);
  - tp and fsdp specs touch the same leaves, so they are alternatives,
    not composable layers, at this model scale.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmm_tpu.parallel.mesh import DP_AXIS

FSDP_AXIS = "fsdp"


def dp_fsdp_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """2-D ('dp', 'fsdp') mesh; 'fsdp' minor so the per-layer gathers ride
    nearest-neighbor ICI.  ``dp=None`` uses every visible device."""
    if devices is None:
        devices = jax.devices()
    if dp is None:
        if len(devices) % fsdp:
            raise ValueError(
                f"{len(devices)} devices not divisible by fsdp={fsdp}")
        dp = len(devices) // fsdp
    elif dp * fsdp != len(devices):
        # mirror the dp=None divisibility check: silently using only
        # devices[:dp*fsdp] would idle the rest of a mis-sized call
        raise ValueError(
            f"dp={dp} x fsdp={fsdp} != {len(devices)} devices")
    grid = np.asarray(devices[: dp * fsdp]).reshape(dp, fsdp)
    return Mesh(grid, (DP_AXIS, FSDP_AXIS))


def _leaf_spec(leaf, fsdp_size: int) -> P:
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    # largest dividing dim; ties -> later (minor) dim
    best, best_dim = -1, None
    for d, n in enumerate(shape):
        if n % fsdp_size == 0 and n >= best:
            best, best_dim = n, d
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = FSDP_AXIS
    return P(*spec)


def fsdp_param_specs(params: Any, fsdp_size: int) -> Any:
    """PartitionSpec pytree mirroring ``params`` (works on any SPMM-family
    state subtree: param trees, EMA twins, optax moment trees)."""
    return jax.tree.map(lambda leaf: _leaf_spec(leaf, fsdp_size), params)


def fsdp_shardings(tree: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a params/EMA/optimizer tree on ``mesh``."""
    fsdp_size = dict(mesh.shape)[FSDP_AXIS]
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        fsdp_param_specs(tree, fsdp_size),
        is_leaf=lambda x: isinstance(x, P))


def fsdp_state_shardings(state: Any, mesh: Mesh) -> Any:
    """Shardings for the FULL pretrain state dict: params/EMA/opt_state get
    the per-leaf largest-dim layout; the queue and step counter stay
    replicated (the queue is updated with a modular scatter each step —
    sharding it would turn the scatter into all-to-all traffic for ~75 MB
    of savings)."""
    repl = NamedSharding(mesh, P())
    out = {}
    for key, sub in state.items():
        if key in ("params", "ema", "opt_state"):
            out[key] = fsdp_shardings(sub, mesh)
        else:
            out[key] = jax.tree.map(lambda _: repl, sub)
    return out


def shard_state_fsdp(state: Any, mesh: Mesh) -> Any:
    """Place a pretrain state on ``mesh`` fully sharded (ZeRO-3 at rest)."""
    return jax.device_put(state, fsdp_state_shardings(state, mesh))
