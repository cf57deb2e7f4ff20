"""Chem-BERT core: the ALBEF-style sectioned BERT re-designed for TPU.

Pure-functional JAX implementation of the architecture the reference builds in
xbert.py: a BERT stack whose layers ``>= fusion_layer`` additionally carry
cross-attention over a second modality, runnable in three modes
(reference xbert.py:563-573):

  - ``mode='text'``        : layers [0, fusion_layer)        (unimodal)
  - ``mode='fusion'``      : layers [fusion_layer, n_layers) (multimodal top)
  - ``mode='multi_modal'`` : all layers

plus ``is_decoder`` causal masking with KV-cache prefix handling (reference
xbert.py:889-948) and an ``encoder_embeds`` input that injects hidden states
directly into the fusion stack bypassing embeddings (reference
xbert.py:958,1054-1063).

TPU-first design choices (vs the reference's eager PyTorch):
  - params are explicit pytrees (nested dicts); every forward is a pure
    function -> trivially jit/pjit/vmap-able and shardable;
  - static shapes everywhere; decode uses preallocated fixed-size KV caches
    written with ``lax.dynamic_update_slice`` (the reference re-runs the full
    prefix every step — its cache plumbing exists but is unused; SURVEY §3.3);
  - cross-attention K/V over the (fixed) encoder sequence are computed once
    per decode and reused every step;
  - fp32 LayerNorm/softmax with optionally-bf16 matmuls.

Weight layout: Linear weights are stored [in, out] (JAX convention; the
checkpoint converter transposes PyTorch's [out, in]).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.ops.attention import multi_head_attention
from spmm_tpu.ops.masks import (
    extend_attention_mask,
    extend_causal_mask,
    invert_encoder_mask,
)
from spmm_tpu.parallel.sp import constrain as _sp_constrain

Params = dict[str, Any]

# --------------------------------------------------------------------------- #
# primitives
# --------------------------------------------------------------------------- #


def dense(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["w"] + p["b"]


def layer_norm(p: Params, x: jnp.ndarray, eps: float) -> jnp.ndarray:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dtype)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # HF 'gelu' is the exact erf formulation (reference config hidden_act)
    return jax.nn.gelu(x, approximate=False)


def _dropout(x, rate, rng, deterministic):
    if deterministic or rate == 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    b, l, hd = x.shape
    return x.reshape(b, l, num_heads, hd // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    b, h, l, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, l, h * d)


# --------------------------------------------------------------------------- #
# embeddings
# --------------------------------------------------------------------------- #


def embeddings_forward(
    p: Params,
    cfg: BertArchConfig,
    input_ids: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    position_offset: int | jnp.ndarray = 0,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """word + position + token-type embeddings -> LN -> dropout.

    ``position_offset`` implements the KV-cache prefix (reference
    xbert.py:203-204 past_key_values_length).  Token type is always 0 in this
    model family (reference xbert.py:206-207).
    """
    if inputs_embeds is None:
        inputs_embeds = p["word"][input_ids]
    seq_len = inputs_embeds.shape[1]
    positions = position_offset + jnp.arange(seq_len)
    x = inputs_embeds + p["position"][positions] + p["token_type"][0]
    # Megatron-SP entry point: seq-shard the residual stream from the start
    x = _sp_constrain(x)
    x = layer_norm(p["ln"], x, cfg.layer_norm_eps)
    return _dropout(x, cfg.hidden_dropout_prob, rng, deterministic)


# --------------------------------------------------------------------------- #
# attention / layer blocks
# --------------------------------------------------------------------------- #


def attention_block(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    kv_source: jnp.ndarray,
    additive_mask: Optional[jnp.ndarray],
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    kv_override: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """Projected MHA + output dense + residual LN (reference xbert.py:362-422).

    ``kv_override`` supplies precomputed (k, v) head tensors — used for cached
    decode (self-attn KV cache, or cross-attn K/V computed once per decode).
    """
    q = split_heads(dense(p["q"], hidden), cfg.num_attention_heads)
    if kv_override is not None:
        k, v = kv_override
    else:
        k = split_heads(dense(p["k"], kv_source), cfg.num_attention_heads)
        v = split_heads(dense(p["v"], kv_source), cfg.num_attention_heads)
    r0, r1 = (jax.random.split(rng) if rng is not None else (None, None))
    ctx = multi_head_attention(
        q, k, v, additive_mask,
        dropout_rate=cfg.attention_probs_dropout_prob,
        dropout_rng=r0, deterministic=deterministic, impl=attention_impl,
    )
    out = dense(p["out"], merge_heads(ctx))
    # Megatron-SP boundary: under parallel.sp.sequence_parallel the exit of
    # the row-parallel out projection is reduce-scattered along seq and the
    # dropout+residual+LN run seq-sharded (no-op otherwise)
    out = _sp_constrain(out)
    out = _dropout(out, cfg.hidden_dropout_prob, r1, deterministic)
    return _sp_constrain(layer_norm(p["ln"], out + hidden, cfg.layer_norm_eps))


def mlp_block(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Intermediate GELU + output dense + residual LN (reference xbert.py:425-451)."""
    up = gelu(dense(p["up"], hidden))
    down = dense(p["down"], up)
    # Megatron-SP boundary (see attention_block)
    down = _sp_constrain(down)
    down = _dropout(down, cfg.hidden_dropout_prob, rng, deterministic)
    return _sp_constrain(layer_norm(p["ln"], down + hidden, cfg.layer_norm_eps))


def layer_forward(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    additive_self_mask: Optional[jnp.ndarray],
    encoder_hidden: Optional[jnp.ndarray] = None,
    additive_cross_mask: Optional[jnp.ndarray] = None,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    self_kv: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    cross_kv: Optional[tuple[jnp.ndarray, jnp.ndarray]] = None,
    attention_impl: str = "xla",
) -> jnp.ndarray:
    """One encoder layer: self-attn (+cross-attn if present) + FFN."""
    rngs = jax.random.split(rng, 3) if rng is not None else (None, None, None)
    hidden = attention_block(
        p["self_attn"], cfg, hidden, hidden, additive_self_mask,
        deterministic, rngs[0], kv_override=self_kv,
        attention_impl=attention_impl,
    )
    if "cross_attn" in p:
        assert encoder_hidden is not None or cross_kv is not None, (
            "encoder_hidden_states required for cross-attention layers"
        )
        hidden = attention_block(
            p["cross_attn"], cfg, hidden, encoder_hidden, additive_cross_mask,
            deterministic, rngs[1], kv_override=cross_kv,
            attention_impl=attention_impl,
        )
    return mlp_block(p["mlp"], cfg, hidden, deterministic, rngs[2])


# --------------------------------------------------------------------------- #
# encoder stack with mode sectioning
# --------------------------------------------------------------------------- #


def _layer_range(cfg: BertArchConfig, mode: str) -> range:
    if mode == "text":
        return range(0, cfg.fusion_layer)
    if mode == "fusion":
        return range(cfg.fusion_layer, cfg.num_hidden_layers)
    if mode == "multi_modal":
        return range(0, cfg.num_hidden_layers)
    raise ValueError(f"unknown mode: {mode!r}")


def encoder_forward(
    params: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    additive_self_mask: Optional[jnp.ndarray],
    encoder_hidden=None,
    additive_cross_mask=None,
    mode: str = "multi_modal",
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attention_impl: str = "xla",
    cross_kv: Optional[Params] = None,
) -> jnp.ndarray:
    """Run the layer stack section selected by ``mode`` (reference xbert.py:537-618).

    ``encoder_hidden``/``additive_cross_mask`` may be lists for multi-source
    cross-attention, assigned round-robin over fusion layers (reference
    xbert.py:497-507 — present-but-unused there; supported here for parity).
    ``remat=True`` rematerializes each layer in the backward pass
    (reference gradient-checkpointing branch, xbert.py:583-605; here a real
    jax.checkpoint instead of unused plumbing).
    ``cross_kv`` supplies precomputed cross-attention K/V per absolute layer
    index ({"k": [L, B, h, Le, D], "v": ...}, see
    spmm_tpu.inference.decoding.precompute_cross_kv) — used when the encoder
    sequence is loop-invariant (decode loops) so its K/V projections are not
    recomputed every step.
    """
    import functools

    fwd = functools.partial(layer_forward, attention_impl=attention_impl)
    if remat:
        # cfg (1) and deterministic (6) are static python values
        fwd = jax.checkpoint(fwd, static_argnums=(1, 6), prevent_cse=False)
    for i in _layer_range(cfg, mode):
        layer_rng = jax.random.fold_in(rng, i) if rng is not None else None
        if isinstance(encoder_hidden, (list, tuple)):
            j = (i - cfg.fusion_layer) % len(encoder_hidden)
            enc, xmask = encoder_hidden[j], additive_cross_mask[j]
        else:
            enc, xmask = encoder_hidden, additive_cross_mask
        ckv = None
        if cross_kv is not None and "cross_attn" in params["layers"][i]:
            ckv = (cross_kv["k"][i], cross_kv["v"][i])
        hidden = fwd(
            params["layers"][i], cfg, hidden, additive_self_mask,
            enc, xmask, deterministic, layer_rng, cross_kv=ckv,
        )
    return hidden


# --------------------------------------------------------------------------- #
# full model forwards (BertModel / BertForMaskedLM equivalents)
# --------------------------------------------------------------------------- #


def bert_forward(
    params: Params,
    cfg: BertArchConfig,
    input_ids: Optional[jnp.ndarray] = None,
    attention_mask: Optional[jnp.ndarray] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,
    encoder_embeds: Optional[jnp.ndarray] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    encoder_attention_mask: Optional[jnp.ndarray] = None,
    is_decoder: bool = False,
    mode: str = "multi_modal",
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
    remat: bool = False,
    attention_impl: str = "xla",
    cross_kv: Optional[Params] = None,
) -> jnp.ndarray:
    """BertModel.forward equivalent (reference xbert.py:950-1091).

    Exactly one of ``input_ids`` / ``inputs_embeds`` / ``encoder_embeds`` must
    be given; ``encoder_embeds`` bypasses the embedding layer (used by fusion
    passes over already-encoded hidden states, reference SPMM_models.py:137).
    ``encoder_hidden_states`` may be a list for round-robin multi-source
    cross-attention.  ``cross_kv`` supplies precomputed per-layer cross K/V
    instead of ``encoder_hidden_states`` (the cross projections are then
    skipped — pass ``encoder_attention_mask`` alongside it).  Returns the
    last hidden state [B, L, H].
    """
    if encoder_embeds is not None:
        hidden = encoder_embeds
        rng_emb = None
    else:
        if rng is not None:
            rng, rng_emb = jax.random.split(rng)
        else:
            rng_emb = None
        hidden = embeddings_forward(
            params["embeddings"], cfg, input_ids, inputs_embeds,
            deterministic=deterministic, rng=rng_emb,
        )

    b, l = hidden.shape[:2]
    if attention_mask is None:
        attention_mask = jnp.ones((b, l), dtype=jnp.int32)
    if is_decoder:
        self_mask = extend_causal_mask(attention_mask, q_len=l, dtype=jnp.float32)
    else:
        self_mask = extend_attention_mask(attention_mask, dtype=jnp.float32)

    cross_mask = None
    if cross_kv is not None and encoder_hidden_states is None:
        if encoder_attention_mask is None:
            encoder_attention_mask = jnp.ones(
                (b, cross_kv["k"].shape[-2]), dtype=jnp.int32)
        cross_mask = invert_encoder_mask(encoder_attention_mask,
                                         dtype=jnp.float32)
    elif encoder_hidden_states is not None:
        if isinstance(encoder_hidden_states, (list, tuple)):
            if encoder_attention_mask is None:
                encoder_attention_mask = [
                    jnp.ones(e.shape[:2], jnp.int32)
                    for e in encoder_hidden_states]
            cross_mask = [invert_encoder_mask(m, dtype=jnp.float32)
                          for m in encoder_attention_mask]
        else:
            if encoder_attention_mask is None:
                encoder_attention_mask = jnp.ones(
                    encoder_hidden_states.shape[:2], dtype=jnp.int32
                )
            cross_mask = invert_encoder_mask(encoder_attention_mask,
                                             dtype=jnp.float32)

    return encoder_forward(
        params, cfg, hidden, self_mask,
        encoder_hidden_states, cross_mask, mode, deterministic, rng,
        remat=remat, attention_impl=attention_impl, cross_kv=cross_kv,
    )


def mlm_head_forward(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    word_embeddings: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LM prediction head: dense+GELU+LN then the vocab decoder
    (reference xbert.py:662-696; the decoder bias is the aliased
    ``cls.predictions.bias``).

    The decoder weight is TIED to the embedding table: HF's init_weights
    ties ``cls.predictions.decoder.weight`` to ``word_embeddings.weight``
    (tie_word_embeddings defaults True; verified shared storage on the
    reference modules), so MLM gradients must flow into the embeddings.
    A tied tree stores no ``decoder.w`` — callers pass the [V, H] embedding
    table; an untied tree (cfg.tie_word_embeddings=False) keeps its own
    ``decoder.w`` and ignores ``word_embeddings``."""
    x = dense(p["transform"], hidden)
    x = gelu(x)
    x = layer_norm(p["ln"], x, cfg.layer_norm_eps)
    if "w" in p["decoder"]:
        return dense(p["decoder"], x)
    assert word_embeddings is not None, (
        "tied LM head needs the embedding table")
    return x @ word_embeddings.T + p["decoder"]["b"]


def mlm_forward(
    params: Params,
    cfg: BertArchConfig,
    **kwargs,
) -> jnp.ndarray:
    """BertForMaskedLM.forward with return_logits=True (reference xbert.py:1377-1428)."""
    hidden = bert_forward(params["bert"], cfg, **kwargs)
    return mlm_head_forward(params["mlm_head"], cfg, hidden,
                            params["bert"]["embeddings"]["word"])


# --------------------------------------------------------------------------- #
# initialization (matches HF BertPreTrainedModel._init_weights: normal(0.02),
# LN scale 1 / bias 0, all linear+embedding biases 0)
# --------------------------------------------------------------------------- #


def _init_linear(rng, d_in, d_out, std):
    return {
        "w": jax.random.normal(rng, (d_in, d_out), jnp.float32) * std,
        "b": jnp.zeros((d_out,), jnp.float32),
    }


def _init_ln(d):
    return {"scale": jnp.ones((d,), jnp.float32), "bias": jnp.zeros((d,), jnp.float32)}


def init_bert_params(rng: jax.Array, cfg: BertArchConfig) -> Params:
    h = cfg.hidden_size
    std = cfg.initializer_range
    # 6 non-layer + up to 10 per layer (self 4 + cross 4 + mlp 2)
    keys = iter(jax.random.split(rng, 6 + cfg.num_hidden_layers * 10))

    def nrm(shape):
        return jax.random.normal(next(keys), shape, jnp.float32) * std

    word = nrm((cfg.vocab_size, h))
    # padding_idx zeroed like nn.Embedding(padding_idx=0) (reference xbert.py:178)
    word = word.at[cfg.pad_token_id].set(0.0)
    params: Params = {
        "embeddings": {
            "word": word,
            "position": nrm((cfg.max_position_embeddings, h)),
            "token_type": nrm((cfg.type_vocab_size, h)),
            "ln": _init_ln(h),
        },
        "layers": [],
    }
    for i in range(cfg.num_hidden_layers):
        layer: Params = {
            "self_attn": {
                "q": _init_linear(next(keys), h, h, std),
                "k": _init_linear(next(keys), h, h, std),
                "v": _init_linear(next(keys), h, h, std),
                "out": _init_linear(next(keys), h, h, std),
                "ln": _init_ln(h),
            },
            "mlp": {
                "up": _init_linear(next(keys), h, cfg.intermediate_size, std),
                "down": _init_linear(next(keys), cfg.intermediate_size, h, std),
                "ln": _init_ln(h),
            },
        }
        if cfg.add_cross_attention and i >= cfg.fusion_layer:
            layer["cross_attn"] = {
                "q": _init_linear(next(keys), h, h, std),
                "k": _init_linear(next(keys), cfg.encoder_width, h, std),
                "v": _init_linear(next(keys), cfg.encoder_width, h, std),
                "out": _init_linear(next(keys), h, h, std),
                "ln": _init_ln(h),
            }
        params["layers"].append(layer)
    return params


def init_mlm_params(rng: jax.Array, cfg: BertArchConfig) -> Params:
    r1, r2, r3 = jax.random.split(rng, 3)
    if cfg.tie_word_embeddings:
        # decoder weight IS the embedding table (HF tie, see
        # mlm_head_forward); only the aliased bias is a separate param
        decoder: Params = {"b": jnp.zeros((cfg.vocab_size,), jnp.float32)}
    else:
        decoder = _init_linear(r3, cfg.hidden_size, cfg.vocab_size,
                               cfg.initializer_range)
    return {
        "bert": init_bert_params(r1, cfg),
        "mlm_head": {
            "transform": _init_linear(r2, cfg.hidden_size, cfg.hidden_size,
                                      cfg.initializer_range),
            "ln": _init_ln(cfg.hidden_size),
            "decoder": decoder,
        },
    }
