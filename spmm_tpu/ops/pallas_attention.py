"""Fused multi-head attention as a Pallas TPU kernel.

One grid cell per (batch, head): Q·K^T, additive mask, fp32 softmax, and
probs·V all stay in VMEM — the [Lq, Lk] score matrix never round-trips
through HBM (the XLA path materializes probabilities between fusions).
Sequences in this model family are short (<= ~150 tokens, SURVEY §5.7), so a
whole attention row-block fits comfortably in VMEM without tiling.

Opt-in on the no-grad inference paths via ``attention_impl="pallas"``
(e.g. spmm_tpu.inference.smiles2pv.predict_pv); the training path keeps the
XLA attention in spmm_tpu.ops.attention (pallas_call is not
auto-differentiable and XLA fuses the backward well at these sizes).
Numerics match the XLA path bit-for-fp32: scores scaled by 1/sqrt(D),
additive -10000 masking pre-softmax (reference xbert.py:304-335 semantics).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mha_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32)              # [Lq, D]
    k = k_ref[0, 0].astype(jnp.float32)              # [Lk, D]
    v = v_ref[0, 0]                                  # [Lk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # [Lq, Lk]
    s = s + m_ref[0].astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_mha(
    q: jnp.ndarray,                      # [B, h, Lq, D]
    k: jnp.ndarray,                      # [B, h, Lk, D]
    v: jnp.ndarray,                      # [B, h, Lk, D]
    additive_mask: Optional[jnp.ndarray] = None,  # broadcastable [B,*,Lq,Lk]
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d ** 0.5)
    if additive_mask is None:
        mask = jnp.zeros((b, lq, lk), jnp.float32)
    else:
        # collapse the head axis: this model family's masks are head-uniform
        mask = jnp.broadcast_to(additive_mask[:, 0],
                                (b, lq, lk)).astype(jnp.float32)

    grid = (b, h)
    return pl.pallas_call(
        functools.partial(_mha_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((b, h, lq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, lq, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, lk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, lq, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * lq * lk * d * 2,
            bytes_accessed=(b * h * (lq + 2 * lk) * d + b * lq * lk) * 4,
            transcendentals=b * h * lq * lk,
        ),
        interpret=interpret,
    )(q, k, v, mask)
