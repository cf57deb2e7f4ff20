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


def test_cross_attention_maps_vs_reference():
    """Cross-attention probabilities match the reference's output_attentions
    (what its save_attention hooks record; xbert.py:337-339)."""
    from conftest import has_reference, has_torch
    if not (has_reference() and has_torch()):
        pytest.skip("reference + torch required")
    import torch
    from reference_shim import import_reference_xbert
    from spmm_tpu.checkpoint.convert import convert_bert_mlm

    ref = import_reference_xbert()
    tcfg = ref.BertConfig(
        vocab_size=300, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=2,
        encoder_width=32, add_cross_attention=True, hidden_act="gelu",
        layer_norm_eps=1e-12, pad_token_id=0, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, autoregressive=0)
    torch.manual_seed(0)
    model = ref.BertForMaskedLM(config=tcfg).eval()
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = convert_bert_mlm(state, CFG)

    g = torch.Generator().manual_seed(1)
    embeds = torch.randn(2, 6, 32, generator=g)
    enc = torch.randn(2, 5, 32, generator=g)
    enc_mask = torch.ones(2, 5, dtype=torch.long)
    enc_mask[1, 3:] = 0
    with torch.no_grad():
        out = model.bert(
            encoder_embeds=embeds, attention_mask=torch.ones(2, 6).long(),
            encoder_hidden_states=enc, encoder_attention_mask=enc_mask,
            return_dict=True, mode="fusion", output_attentions=True)
    want = [a.numpy() for a in out.cross_attentions]

    maps = cross_attention_maps(
        params["bert"], CFG, jnp.asarray(embeds.numpy()),
        jnp.ones((2, 6), jnp.int32), jnp.asarray(enc.numpy()),
        jnp.asarray(enc_mask.numpy()))
    assert len(maps) == len(want)
    for got, w in zip(maps, want):
        np.testing.assert_allclose(np.asarray(got), w, atol=1e-5)
