"""Multi-head attention core.

XLA implementation (einsum -> fp32 softmax -> einsum); the Pallas fused kernel
in spmm_tpu.ops.pallas_attention is swapped in for the long-sequence training
path once shapes warrant it.  Matches reference xbert.py:304-350 semantics:
scores scaled by 1/sqrt(head_dim), additive mask applied pre-softmax, dropout
on the attention probabilities.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jnp.ndarray,  # [B, h, Lq, D]
    k: jnp.ndarray,  # [B, h, Lk, D]
    v: jnp.ndarray,  # [B, h, Lk, D]
    additive_mask: Optional[jnp.ndarray] = None,  # broadcastable to [B, h, Lq, Lk]
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> jnp.ndarray:
    """Scaled dot-product attention; returns [B, h, Lq, D].

    Scores and softmax are computed in fp32 regardless of input dtype (the
    reference runs fp16 AMP with fp32 softmax via autocast; on TPU we run
    bf16 matmuls with an fp32 softmax).
    """
    head_dim = q.shape[-1]
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(head_dim, jnp.float32))
    if additive_mask is not None:
        scores = scores + additive_mask.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)
