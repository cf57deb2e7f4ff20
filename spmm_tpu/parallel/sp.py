"""Sequence parallelism (Megatron-SP) via GSPMD activation constraints.

The reference has no sequence parallelism (its only scaling axis is DDP,
reference SPMM_pretrain.py:35-36).  Tensor parallelism (parallel/tp.py)
leaves the residual-stream work between the matmul sandwiches — LayerNorm,
dropout, residual adds — replicated across the 'tp' group: every tp peer
computes the identical [B, L, H] elementwise pass.  Megatron-SP removes
that redundancy by sharding those regions along the *sequence* dim over
the same 'tp' group, turning each block's exit all-reduce into a
reduce-scatter and its entry into an all-gather (same bytes on the wire,
1/tp of the elementwise FLOPs and activation memory).

TPU-native shape: we do NOT rewrite the model with explicit collectives.
``models/bert.py`` calls :func:`constrain` on the residual stream at block
boundaries (embeddings out, attention-block out, mlp-block out); outside a
:func:`sequence_parallel` context that is an identity no-op, inside it the
call applies ``jax.lax.with_sharding_constraint`` pinning the seq dim to
the 'tp' mesh axis, and GSPMD derives the reduce-scatter/all-gather
placement.  The forwards stay pure and unchanged on a single device.

Composition with the pretrain step (training/pretrain.py), which runs
manual-dp ``shard_map`` with 'tp' left to GSPMD (``axis_names={'dp'}``):
jax 0.9 rejects ``with_sharding_constraint`` inside a partial-auto
shard_map when the constraint's mesh types the manual axis as Auto
("Axes mentioned in `vma` field ... should be of type Manual").  But
placement (``jax.device_put``) rejects NamedShardings over Manual-typed
axes.  So :func:`sequence_parallel` builds a *constraint twin* of the
mesh — same devices and axis names, dp retyped Manual — used only inside
the trace; the caller's placement mesh stays all-Auto.

CONTRACT — fresh jits only.  The context is read at TRACE time and the jit
cache does NOT key on it: calling an already-compiled function inside the
context silently serves the unconstrained executable (and vice versa — an
executable first traced inside the context keeps its constraints forever).
Only wrap code that is traced fresh under the context: a jit created inside
it, or a not-yet-compiled one.  Library code honors this by construction —
the single consumer is ``make_pretrain_step(sp=True)``, which builds a new
jit per call and enters the context inside the traced body::

    with sequence_parallel(mesh):                  # inside a dp shard_map
        loss = pretrain_loss(...)

    with sequence_parallel(mesh, batch_axis='dp'): # pure-GSPMD (no shard_map)
        logits = jax.jit(downstream_forward)(...)  # jit created HERE
"""

from __future__ import annotations

from contextlib import contextmanager
from contextvars import ContextVar
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import AxisType, Mesh, NamedSharding, PartitionSpec as P

from spmm_tpu.parallel.mesh import DP_AXIS
from spmm_tpu.parallel.tp import TP_AXIS

_ACT_CONSTRAINT: ContextVar[Optional[NamedSharding]] = ContextVar(
    "spmm_sp_act_constraint", default=None)


def constrain(x: jnp.ndarray) -> jnp.ndarray:
    """Residual-stream hook: pin ``x``'s seq dim to the active sp sharding.

    Identity unless traced under :func:`sequence_parallel`.  Only rank-3
    [B, L, H] activations are constrained — decode-time rank mismatches
    (cache slices, folded lanes) pass through untouched.
    """
    shd = _ACT_CONSTRAINT.get()
    if shd is None or x.ndim != 3:
        return x
    return jax.lax.with_sharding_constraint(x, shd)


def _constraint_mesh(mesh: Mesh, manual_axes: frozenset[str]) -> Mesh:
    """Twin of ``mesh`` with ``manual_axes`` retyped Manual (see module doc)."""
    if not manual_axes:
        return mesh
    types = tuple(
        AxisType.Manual if name in manual_axes else mesh.axis_types[i]
        for i, name in enumerate(mesh.axis_names))
    if types == tuple(mesh.axis_types):
        return mesh
    return Mesh(mesh.devices, mesh.axis_names, axis_types=types)


@contextmanager
def sequence_parallel(
    mesh: Mesh,
    *,
    batch_axis: Optional[str] = None,
    seq_axis: str = TP_AXIS,
):
    """Enable Megatron-SP constraints for model code traced in this context.

    ``batch_axis=None`` means the batch dim is already manual (the caller is
    inside a dp shard_map; the dp axis is retyped Manual on the constraint
    twin).  ``batch_axis='dp'`` is the pure-GSPMD form (no shard_map): both
    the batch and seq dims are constrained.
    """
    if seq_axis not in mesh.axis_names:
        raise ValueError(f"mesh has no {seq_axis!r} axis: {mesh.axis_names}")
    manual = frozenset() if batch_axis is not None else (
        frozenset({DP_AXIS}) & frozenset(mesh.axis_names))
    cmesh = _constraint_mesh(mesh, manual)
    shd = NamedSharding(cmesh, P(batch_axis, seq_axis, None))
    token = _ACT_CONSTRAINT.set(shd)
    try:
        yield
    finally:
        _ACT_CONSTRAINT.reset(token)
