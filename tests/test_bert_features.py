"""Feature-parity extras: multi-source cross-attention, remat, introspection."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.models.introspect import cross_attention_maps

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
CFG = BertArchConfig(**TINY, add_cross_attention=True)


@pytest.fixture(scope="module")
def params():
    return jbert.init_bert_params(jax.random.PRNGKey(0), CFG)


def test_multi_source_cross_attention(params):
    """List-valued encoder_hidden_states round-robins over fusion layers
    (reference xbert.py:497-507)."""
    rng = jax.random.PRNGKey(1)
    ids = jax.random.randint(rng, (2, 6), 4, 300)
    e1 = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 32))
    e2 = jax.random.normal(jax.random.fold_in(rng, 2), (2, 7, 32))
    out = jbert.bert_forward(params, CFG, input_ids=ids,
                             encoder_hidden_states=[e1, e2])
    assert out.shape == (2, 6, 32)
    # single-source call must differ (different K/V per layer)
    out1 = jbert.bert_forward(params, CFG, input_ids=ids,
                              encoder_hidden_states=e1)
    assert float(jnp.abs(out - out1).max()) > 1e-4
    # two identical sources == single source
    out_dup = jbert.bert_forward(params, CFG, input_ids=ids,
                                 encoder_hidden_states=[e1, e1])
    np.testing.assert_allclose(np.asarray(out_dup), np.asarray(out1),
                               atol=1e-6)


def test_remat_matches_and_differentiates(params):
    rng = jax.random.PRNGKey(2)
    ids = jax.random.randint(rng, (2, 6), 4, 300)
    enc = jax.random.normal(rng, (2, 5, 32))
    out_plain = jbert.bert_forward(params, CFG, input_ids=ids,
                                   encoder_hidden_states=enc)
    out_remat = jbert.bert_forward(params, CFG, input_ids=ids,
                                   encoder_hidden_states=enc, remat=True)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_remat),
                               atol=1e-6)

    def loss(p, remat):
        return jnp.sum(jbert.bert_forward(
            p, CFG, input_ids=ids, encoder_hidden_states=enc, remat=remat) ** 2)

    g_plain = jax.grad(loss)(params, False)
    g_remat = jax.grad(loss)(params, True)
    a = jax.tree.leaves(g_plain)
    b = jax.tree.leaves(g_remat)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_cross_attention_maps(params):
    rng = jax.random.PRNGKey(3)
    embeds = jax.random.normal(rng, (2, 6, 32))
    att = jnp.ones((2, 6), jnp.int32)
    enc = jax.random.normal(jax.random.fold_in(rng, 1), (2, 5, 32))
    enc_mask = jnp.ones((2, 5), jnp.int32).at[1, 3:].set(0)
    maps = cross_attention_maps(params, CFG, embeds, att, enc, enc_mask)
    assert len(maps) == CFG.num_hidden_layers - CFG.fusion_layer
    for m in maps:
        assert m.shape == (2, CFG.num_attention_heads, 6, 5)
        np.testing.assert_allclose(np.asarray(m.sum(-1)), 1.0, atol=1e-5)
        # masked encoder keys get ~zero attention
        assert float(m[1, :, :, 3:].max()) < 1e-4
