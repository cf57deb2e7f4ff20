"""Golden numerics parity: spmm_tpu chem-BERT vs the reference torch graph.

Strategy (SURVEY §4b without the released checkpoint): instantiate the
reference xbert.BertForMaskedLM with seeded random weights, convert the
state_dict through spmm_tpu.checkpoint.convert, and require forward outputs to
match within 1e-4 across every architectural feature the workloads exercise:
mode sectioning, causal decoding, cross-attention, encoder_embeds injection,
and the LM head.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, property_config, text_config
from spmm_tpu.checkpoint.convert import convert_bert_mlm
from spmm_tpu.models import bert as jbert

from conftest import requires_reference

TOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    from reference_shim import import_reference_xbert

    return import_reference_xbert()


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


def make_pair(ref, torch, cfg_path, seed=0):
    """(reference torch model, converted jax params, arch config)."""
    torch.manual_seed(seed)
    tcfg = ref.BertConfig.from_json_file(cfg_path)
    model = ref.BertForMaskedLM(config=tcfg).eval()
    state = {
        k: v.detach().to(torch.float32).numpy()
        for k, v in model.state_dict().items()
    }
    cfg = BertArchConfig.from_json(cfg_path)
    params = convert_bert_mlm(state, cfg)
    return model, params, cfg


@pytest.fixture(scope="module")
def text_pair(ref, torch):
    return make_pair(ref, torch, "/root/reference/config_bert.json")


@pytest.fixture(scope="module")
def prop_pair(ref, torch):
    return make_pair(ref, torch, "/root/reference/config_bert_property.json", seed=1)


def rand_inputs(torch, bs=3, ln=11, seed=0):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(4, 300, (bs, ln), generator=g)
    mask = torch.ones(bs, ln, dtype=torch.long)
    mask[1, 7:] = 0
    mask[2, 4:] = 0
    return ids, mask


@requires_reference
@pytest.mark.parametrize("mode", ["text", "fusion", "multi_modal"])
def test_encoder_modes(ref, torch, text_pair, mode):
    model, params, cfg = text_pair
    ids, mask = rand_inputs(torch)
    enc_hidden = torch.randn(3, 7, 768, generator=torch.Generator().manual_seed(3))
    enc_mask = torch.ones(3, 7, dtype=torch.long)
    enc_mask[0, 5:] = 0

    kwargs = {}
    jkwargs = {}
    if mode in ("fusion", "multi_modal"):
        kwargs = dict(encoder_hidden_states=enc_hidden, encoder_attention_mask=enc_mask)
        jkwargs = dict(
            encoder_hidden_states=jnp.asarray(enc_hidden.numpy()),
            encoder_attention_mask=jnp.asarray(enc_mask.numpy()),
        )
    with torch.no_grad():
        want = model.bert(
            ids, attention_mask=mask, return_dict=True, mode=mode, **kwargs
        ).last_hidden_state.numpy()
    got = jbert.bert_forward(
        params["bert"], cfg,
        input_ids=jnp.asarray(ids.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
        mode=mode, **jkwargs,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=TOL, rtol=0)


@requires_reference
def test_decoder_causal(ref, torch, text_pair):
    model, params, cfg = text_pair
    ids, mask = rand_inputs(torch, seed=5)
    enc_hidden = torch.randn(3, 6, 768, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        want = model(
            ids, attention_mask=mask,
            encoder_hidden_states=enc_hidden,
            encoder_attention_mask=torch.ones(3, 6, dtype=torch.long),
            return_dict=True, is_decoder=True, return_logits=True,
        ).numpy()
    got = jbert.mlm_forward(
        params, cfg,
        input_ids=jnp.asarray(ids.numpy()),
        attention_mask=jnp.asarray(mask.numpy()),
        encoder_hidden_states=jnp.asarray(enc_hidden.numpy()),
        encoder_attention_mask=jnp.ones((3, 6), jnp.int32),
        is_decoder=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=TOL, rtol=0)


@requires_reference
def test_encoder_embeds_fusion(ref, torch, text_pair):
    """encoder_embeds bypasses embeddings into the fusion stack
    (reference xbert.py:1054-1063, used by SPMM ITM; SPMM_models.py:137-150)."""
    model, params, cfg = text_pair
    g = torch.Generator().manual_seed(11)
    embeds = torch.randn(2, 9, 768, generator=g)
    att = torch.ones(2, 9, dtype=torch.long)
    enc_hidden = torch.randn(2, 5, 768, generator=g)
    enc_mask = torch.ones(2, 5, dtype=torch.long)
    enc_mask[1, 3:] = 0
    with torch.no_grad():
        want = model.bert(
            encoder_embeds=embeds, attention_mask=att,
            encoder_hidden_states=enc_hidden, encoder_attention_mask=enc_mask,
            return_dict=True, mode="fusion",
        ).last_hidden_state.numpy()
    got = jbert.bert_forward(
        params["bert"], cfg,
        encoder_embeds=jnp.asarray(embeds.numpy()),
        attention_mask=jnp.asarray(att.numpy()),
        encoder_hidden_states=jnp.asarray(enc_hidden.numpy()),
        encoder_attention_mask=jnp.asarray(enc_mask.numpy()),
        mode="fusion",
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=TOL, rtol=0)


@requires_reference
def test_property_encoder_inputs_embeds(ref, torch, prop_pair):
    """property encoder is driven purely via inputs_embeds (SPMM_models.py:90);
    also check its causal variant used by MPM (SPMM_models.py:242)."""
    model, params, cfg = prop_pair
    g = torch.Generator().manual_seed(13)
    embeds = torch.randn(2, 54, 768, generator=g)
    for dec in (False, True):
        with torch.no_grad():
            want = model.bert(
                inputs_embeds=embeds, return_dict=True, is_decoder=dec
            ).last_hidden_state.numpy()
        got = jbert.bert_forward(
            params["bert"], cfg,
            inputs_embeds=jnp.asarray(embeds.numpy()),
            is_decoder=dec,
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=TOL, rtol=0)


@requires_reference
def test_mode_text_matches_six_layer_prefix(text_pair, torch):
    """mode='text' must equal running only layers [0, fusion) — guards the
    sectioning logic against off-by-one (reference xbert.py:563-566)."""
    _, params, cfg = text_pair
    ids = jnp.asarray(torch.randint(4, 300, (2, 8)).numpy())
    out_text = jbert.bert_forward(params["bert"], cfg, input_ids=ids, mode="text")
    # manual: embeddings + layers 0..5
    emb = jbert.embeddings_forward(params["bert"]["embeddings"], cfg, input_ids=ids)
    mask = jbert.extend_attention_mask(jnp.ones(ids.shape, jnp.int32))
    h = emb
    for i in range(cfg.fusion_layer):
        h = jbert.layer_forward(params["bert"]["layers"][i], cfg, h, mask)
    np.testing.assert_allclose(np.asarray(out_text), np.asarray(h), atol=1e-6)
