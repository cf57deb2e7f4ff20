"""Pallas fused attention vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.ops.attention import multi_head_attention
from spmm_tpu.ops.masks import extend_attention_mask, extend_causal_mask
from spmm_tpu.ops.pallas_attention import pallas_mha


@pytest.mark.parametrize("lq,lk,mask_kind", [
    (16, 16, "none"),
    (24, 24, "padding"),
    (24, 24, "causal"),
    (1, 32, "padding"),     # decode-shaped query
    (8, 16, "padding"),     # cross-attention shaped
])
def test_pallas_matches_xla(lq, lk, mask_kind):
    rng = jax.random.PRNGKey(0)
    b, h, d = 3, 4, 64
    q = jax.random.normal(jax.random.fold_in(rng, 0), (b, h, lq, d))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, lk, d))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, lk, d))

    if mask_kind == "none":
        mask = None
    elif mask_kind == "padding":
        bin_mask = jnp.ones((b, lk), jnp.int32).at[1, lk // 2:].set(0)
        mask = extend_attention_mask(bin_mask)
    else:
        bin_mask = jnp.ones((b, lk), jnp.int32)
        mask = extend_causal_mask(bin_mask, q_len=lq, past_len=lk - lq)

    want = multi_head_attention(q, k, v, mask)
    got = pallas_mha(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)


def test_pallas_bf16():
    rng = jax.random.PRNGKey(3)
    b, h, l, d = 2, 2, 16, 64
    q = jax.random.normal(rng, (b, h, l, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, h, l, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, h, l, d), jnp.bfloat16)
    want = multi_head_attention(q, k, v, None)
    got = pallas_mha(q, k, v, None, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want, dtype=np.float32), atol=3e-2)


def test_predict_pv_pallas_matches_xla():
    """The pallas attention path produces the same PV predictions as XLA
    (tiny config, interpret mode)."""
    from spmm_tpu.configs import BertArchConfig
    from spmm_tpu.inference.smiles2pv import predict_pv
    from spmm_tpu.models.spmm import init_spmm_params

    TINY = dict(
        vocab_size=300, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=1, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=1,
        encoder_width=64,
    )
    tc = BertArchConfig(**TINY, add_cross_attention=True)
    pc = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 1,
                           "fusion_layer": 1}, add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(0), tc, pc,
                              with_pretrain_heads=False)
    ids = jax.random.randint(jax.random.PRNGKey(1), (2, 8), 4, 300)
    mask = jnp.ones((2, 8), jnp.int32)
    want = predict_pv(params, ids, mask, text_cfg=tc, prop_cfg=pc,
                      n_properties=4)
    got = predict_pv(params, ids, mask, text_cfg=tc, prop_cfg=pc,
                     n_properties=4, attention_impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=0)
