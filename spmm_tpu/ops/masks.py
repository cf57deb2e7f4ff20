"""Additive attention-mask construction.

Preserves the reference's exact numerics: masked positions receive an additive
``-10000.0`` (NOT -inf), applied to the pre-softmax scores (reference
xbert.py:941-948).  With fp32 softmax this removes masked positions to within
float precision while remaining bf16-safe.

Mask conventions (binary masks are 1 = attend, 0 = ignore):
  - encoder self-attention:   [B, L]    -> [B, 1, 1, L]
  - decoder self-attention:   [B, L]    -> [B, 1, Q, K] with a lower-triangular
    causal structure; when a KV-cache prefix of length ``past_len`` is present
    the query rows are offset so every query attends to the whole prefix
    (reference xbert.py:911-931).
  - cross-attention (encoder side): [B, L_enc] -> [B, 1, 1, L_enc], never
    causal (reference xbert.py:1037-1043 via invert_attention_mask).
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_VALUE = -10000.0


def extend_attention_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Binary padding mask [B, L] -> additive [B, 1, 1, L]."""
    return ((1.0 - mask.astype(dtype)) * MASK_VALUE)[:, None, None, :]


def extend_causal_mask(
    mask: jnp.ndarray,
    q_len: int,
    past_len: int = 0,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Binary padding mask [B, K] -> additive causal mask [B, 1, Q, K].

    ``K = past_len + q_len`` (the padding mask covers cache prefix + current
    queries).  Query row q may attend key position k iff ``k <= past_len + q``
    and the key is not padding — the tril-with-prefix semantics of reference
    xbert.py:911-931.
    """
    k_len = mask.shape[-1]
    q_pos = jnp.arange(q_len)[:, None] + past_len
    k_pos = jnp.arange(k_len)[None, :]
    causal = (k_pos <= q_pos).astype(dtype)  # [Q, K]
    combined = causal[None, :, :] * mask.astype(dtype)[:, None, :]
    return ((1.0 - combined) * MASK_VALUE)[:, None, :, :]


def invert_encoder_mask(mask: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Cross-attention mask over encoder keys: [B, L_enc] -> [B, 1, 1, L_enc]."""
    return extend_attention_mask(mask, dtype)
