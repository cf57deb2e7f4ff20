"""Attention-map introspection (reference xbert.py:251-263 save_attention
hooks, used for the paper's interpretability figures).

Rather than mutable hooks, this recomputes the requested layer's attention
probabilities functionally — jit-able and side-effect free.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.ops.masks import extend_attention_mask, invert_encoder_mask

Params = dict[str, Any]


def _attention_probs(p, cfg, hidden, kv_source, additive_mask):
    q = jbert.split_heads(jbert.dense(p["q"], hidden), cfg.num_attention_heads)
    k = jbert.split_heads(jbert.dense(p["k"], kv_source),
                          cfg.num_attention_heads)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(cfg.head_dim, jnp.float32))
    if additive_mask is not None:
        scores = scores + additive_mask
    return jax.nn.softmax(scores, axis=-1)


def cross_attention_maps(
    params: Params,        # bert tree (e.g. params["text_encoder"]["bert"])
    cfg: BertArchConfig,
    encoder_embeds: jnp.ndarray,        # queries already encoded [B, Lq, H]
    attention_mask: jnp.ndarray,        # [B, Lq]
    encoder_hidden_states: jnp.ndarray,  # keys [B, Lk, H]
    encoder_attention_mask: Optional[jnp.ndarray] = None,
) -> list[jnp.ndarray]:
    """Per-fusion-layer cross-attention probabilities [B, heads, Lq, Lk].

    Replays the fusion stack, capturing each layer's cross-attention softmax
    (what the reference's save_attention_map hook records).
    """
    if encoder_attention_mask is None:
        encoder_attention_mask = jnp.ones(encoder_hidden_states.shape[:2],
                                          jnp.int32)
    self_mask = extend_attention_mask(attention_mask)
    cross_mask = invert_encoder_mask(encoder_attention_mask)

    maps = []
    hidden = encoder_embeds
    for i in range(cfg.fusion_layer, cfg.num_hidden_layers):
        lp = params["layers"][i]
        hidden = jbert.attention_block(lp["self_attn"], cfg, hidden, hidden,
                                       self_mask)
        maps.append(_attention_probs(lp["cross_attn"], cfg, hidden,
                                     encoder_hidden_states, cross_mask))
        hidden = jbert.attention_block(lp["cross_attn"], cfg, hidden,
                                       encoder_hidden_states, cross_mask)
        hidden = jbert.mlp_block(lp["mlp"], cfg, hidden)
    return maps
