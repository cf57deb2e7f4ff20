"""Multi-head attention core.

Two implementations behind one interface (reference xbert.py:304-350
semantics: scores scaled by 1/sqrt(head_dim), additive mask pre-softmax,
dropout on the probabilities):

  - impl="xla"    einsum -> fp32 softmax -> einsum (default; only path that
                  supports attention-prob dropout, i.e. training)
  - impl="pallas" fused VMEM kernel (spmm_tpu.ops.pallas_attention) for
                  no-dropout inference paths; falls back to interpret mode
                  off-TPU
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
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention; returns [B, h, Lq, D].

    Scores and softmax are computed in fp32 regardless of input dtype (the
    reference runs fp16 AMP with fp32 softmax via autocast; on TPU we run
    bf16 matmuls with an fp32 softmax).
    """
    if impl == "pallas" and (deterministic or dropout_rate == 0.0):
        from spmm_tpu.ops.pallas_attention import pallas_mha

        return pallas_mha(q, k, v, additive_mask,
                          interpret=jax.default_backend() != "tpu")
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
