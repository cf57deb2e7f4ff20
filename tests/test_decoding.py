"""Decoder parity: KV-cached decoding and beam search vs reference-style
torch oracles (on tiny configs for speed) and vs full-prefix recomputation.

Chain of evidence (the released checkpoint is not available in this repo):
  1. test_bert_parity proves the JAX stack == reference xbert numerics.
  2. here, cached decode == full-prefix forward (cache exactness), and
  3. each workload's decode loop == a torch oracle written to mirror the
     reference driver line-by-line (cited per test).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.checkpoint.convert import convert_bert_mlm
from spmm_tpu.inference.decoding import (
    BeamSpec, beam_search, decode_step, greedy_decode, init_self_cache,
    precompute_cross_kv,
)
from spmm_tpu.inference.smiles2pv import predict_pv
from spmm_tpu.models import bert as jbert
from spmm_tpu.models.spmm import convert_spmm_checkpoint

from conftest import requires_reference

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return BertArchConfig(**TINY, add_cross_attention=True)


@pytest.fixture(scope="module")
def tiny_prop_cfg():
    return BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2,
                             "fusion_layer": 2}, add_cross_attention=False)


@pytest.fixture(scope="module")
def ref():
    from reference_shim import import_reference_xbert

    return import_reference_xbert()


@pytest.fixture(scope="module")
def torch():
    import torch

    return torch


def make_ref_mlm(ref, torch, cfg: BertArchConfig, seed=0):
    tcfg = ref.BertConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        type_vocab_size=cfg.type_vocab_size,
        fusion_layer=cfg.fusion_layer, encoder_width=cfg.encoder_width,
        add_cross_attention=cfg.add_cross_attention,
        hidden_act="gelu", layer_norm_eps=1e-12, pad_token_id=0,
        hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
        autoregressive=0,
    )
    torch.manual_seed(seed)
    return ref.BertForMaskedLM(config=tcfg).eval()


def to_numpy_state(torch, module, prefix=""):
    return {f"{prefix}{k}": v.detach().to(torch.float32).numpy()
            for k, v in module.state_dict().items()}


# --------------------------------------------------------------------------- #
# 1. cached decode == full-prefix forward
# --------------------------------------------------------------------------- #


def test_cache_matches_full_prefix(tiny_cfg):
    rng = jax.random.PRNGKey(0)
    params = jbert.init_mlm_params(rng, tiny_cfg)
    b, steps = 3, 7
    enc = jax.random.normal(jax.random.fold_in(rng, 1), (b, 5, tiny_cfg.hidden_size))
    enc_mask = jnp.ones((b, 5), jnp.int32).at[1, 3:].set(0)
    toks = jax.random.randint(jax.random.fold_in(rng, 2), (b, steps), 4, 300)

    # cached, token by token
    T = steps + 2
    cache = init_self_cache(tiny_cfg, b, T)
    cross_kv = precompute_cross_kv(params, tiny_cfg, enc)
    seqs = jnp.zeros((b, T), jnp.int32)
    cached_logits = []
    for pos in range(steps):
        seqs = seqs.at[:, pos].set(toks[:, pos])
        logits, cache = decode_step(
            params, tiny_cfg, toks[:, pos], jnp.int32(pos), cache,
            (seqs != 0).astype(jnp.int32), cross_kv, enc_mask)
        cached_logits.append(logits)
    cached = jnp.stack(cached_logits, axis=1)          # [b, steps, V]

    # full-prefix (the reference's approach)
    full = jbert.mlm_forward(
        params, tiny_cfg, input_ids=toks,
        attention_mask=(toks != 0).astype(jnp.int32),
        encoder_hidden_states=enc, encoder_attention_mask=enc_mask,
        is_decoder=True)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               atol=2e-5, rtol=0)


# --------------------------------------------------------------------------- #
# 2. smiles2pv scan vs reference-style torch loop
# --------------------------------------------------------------------------- #


@requires_reference
@pytest.mark.parametrize("n_props", [5, 20])
def test_smiles2pv_parity(ref, torch, tiny_cfg, tiny_prop_cfg, n_props):
    """n_props=5 runs the single-segment scan; n_props=20 crosses the
    16-slot segment boundary of predict_pv's growing-buffer scan (the
    production 53-prop path crosses two)."""
    text_model = make_ref_mlm(ref, torch, tiny_cfg, seed=0)
    prop_model = make_ref_mlm(ref, torch, tiny_prop_cfg, seed=1).bert
    h = tiny_cfg.hidden_size
    g = torch.Generator().manual_seed(2)
    torch.manual_seed(3)
    property_embed = torch.nn.Linear(1, h)
    mtr = torch.nn.Sequential(
        torch.nn.Linear(h, h), torch.nn.GELU(),
        torch.nn.LayerNorm(h, 1e-12), torch.nn.Linear(h, 1)).eval()
    property_cls = torch.randn(1, 1, h, generator=g) * 0.1
    property_mask_vec = torch.randn(1, 1, h, generator=g) * 0.1

    state = {}
    state.update(to_numpy_state(torch, text_model, "text_encoder."))
    state.update(to_numpy_state(torch, prop_model, "property_encoder."))
    state.update(to_numpy_state(torch, property_embed, "property_embed."))
    state.update(to_numpy_state(torch, mtr, "property_mtr_head."))
    state["property_cls"] = property_cls.numpy()
    state["property_mask"] = property_mask_vec.numpy()
    params = jax.tree.map(jnp.asarray, convert_spmm_checkpoint(
        state, tiny_cfg, tiny_prop_cfg, with_pretrain_heads=False))

    b, L = 2, 9
    ids = torch.randint(4, 300, (b, L), generator=g)
    mask = torch.ones(b, L, dtype=torch.long)
    mask[1, 6:] = 0

    # --- torch oracle mirroring reference d_smiles2pv.py:14-26,61-70 ---
    with torch.no_grad():
        text_embeds = text_model.bert(
            ids, attention_mask=mask, return_dict=True, mode="text"
        ).last_hidden_state
        prop_input = property_cls.expand(b, -1, -1)
        preds = []
        for _ in range(n_props):
            prop_embeds = prop_model(
                inputs_embeds=prop_input, return_dict=True).last_hidden_state
            atts = torch.ones(prop_input.size()[:-1], dtype=torch.long)
            out = text_model.bert(
                encoder_embeds=prop_embeds, attention_mask=atts,
                encoder_hidden_states=text_embeds, encoder_attention_mask=mask,
                return_dict=True, is_decoder=True, mode="fusion",
            ).last_hidden_state
            pred = mtr(out).squeeze(-1)[:, -1]
            preds.append(pred)
            prop_input = torch.cat(
                [prop_input, property_embed(pred[:, None, None])], dim=1)
        want = torch.stack(preds, dim=-1).numpy()

    got = predict_pv(
        params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
        text_cfg=tiny_cfg, prop_cfg=tiny_prop_cfg, n_properties=n_props)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=0)

    # bf16 fast path: fp32 LN/softmax + fp32 scan carry keep the drift small
    # but the autoregressive feedback compounds it — loose gate only.
    got_bf16 = np.asarray(predict_pv(
        params, jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
        text_cfg=tiny_cfg, prop_cfg=tiny_prop_cfg, n_properties=n_props,
        bf16=True))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got_bf16, want, atol=0.05 * scale, rtol=0)


# --------------------------------------------------------------------------- #
# 3. deterministic k-beam vs reference-style torch loop
# --------------------------------------------------------------------------- #


def torch_reference_beam(torch, model, prop_embeds, k, stop_count, max_steps=100):
    """Torch oracle mirroring reference d_pv2smiles_single.py:79-110 /
    d_rxn_prediction.py:95-122 (deterministic k-beam)."""

    def gen(product_input):
        atts = torch.where(product_input == 0, 0, 1)
        n = product_input.size(0)
        with torch.no_grad():
            logits = model(
                product_input, attention_mask=atts,
                encoder_hidden_states=prop_embeds.expand(n, -1, -1),
                encoder_attention_mask=torch.ones(
                    n, prop_embeds.size(1), dtype=torch.long),
                return_dict=True, is_decoder=True, return_logits=True,
            )[:, -1, :]
        p = torch.softmax(logits, dim=-1)
        out = torch.topk(p, k=k, dim=-1)
        return torch.log(out.values), out.indices

    product_input = torch.tensor([[2]])
    values, indices = gen(product_input)
    product_input = torch.cat(
        [torch.full((k, 1), 2), indices.squeeze(0).unsqueeze(-1)], dim=-1)
    current_p = values.squeeze(0)
    final_output = []
    for _ in range(max_steps):
        values, indices = gen(product_input)
        k2_p = current_p[:, None] + values
        product_input_k2 = torch.cat(
            [product_input.unsqueeze(1).repeat(1, k, 1),
             indices.unsqueeze(-1)], dim=-1)
        if 3 in indices:
            ends = (indices == 3).nonzero(as_tuple=False)
            for e in ends:
                p = k2_p[e[0], e[1]].item()
                final_output.append((p, product_input_k2[e[0], e[1]]))
                k2_p[e[0], e[1]] = -1e5
            if len(final_output) >= stop_count:
                break
        current_p, i = torch.topk(k2_p.flatten(), k)
        nxt = np.array(np.unravel_index(i.numpy(), tuple(k2_p.shape))).T
        product_input = torch.stack(
            [product_input_k2[a, b] for a, b in nxt], dim=0)
    final_output = sorted(final_output, key=lambda x: x[0], reverse=True)[:k]
    return final_output


@requires_reference
# k=5 is the rxn CLI default (reference d_rxn_prediction.py:70 n_beam=5,
# stop_count k**2=25) — the widest operating point the CLIs ship with
@pytest.mark.parametrize("k", [2, 3, 5])
@pytest.mark.parametrize("stop_count_mode", ["k2", "k1"])
def test_beam_parity(ref, torch, tiny_cfg, stop_count_mode, k):
    model = make_ref_mlm(ref, torch, tiny_cfg, seed=7)
    with torch.no_grad():
        # bias [SEP] into the top-k so beams actually finish on random weights
        model.cls.predictions.bias[3] += 2.0
        model.cls.predictions.decoder.bias[3] = model.cls.predictions.bias[3]
    state = to_numpy_state(torch, model)
    params = jax.tree.map(jnp.asarray, convert_bert_mlm(state, tiny_cfg))

    g = torch.Generator().manual_seed(11)
    prop_embeds = torch.randn(1, 6, tiny_cfg.hidden_size, generator=g)
    stop = k * k if stop_count_mode == "k2" else k

    want = torch_reference_beam(torch, model, prop_embeds, k, stop)
    assert want, "oracle should finish beams on random weights"

    spec = BeamSpec(k=k, stop_count=stop, stochastic=False)
    got = jax.jit(beam_search, static_argnames=("cfg", "spec"))(
        params, tiny_cfg,
        jnp.asarray(prop_embeds[0].numpy()),
        jnp.ones((6,), jnp.int32), spec)
    got = jax.device_get(got)

    assert int(got["n_finished"]) == len(
        torch_reference_beam(torch, model, prop_embeds, k, stop)) or \
        int(got["n_finished"]) >= stop
    for j, (p, seq) in enumerate(want):
        ln = int(got["lengths"][j])
        np.testing.assert_allclose(got["logp"][j], p, atol=1e-4)
        np.testing.assert_array_equal(got["seqs"][j][:ln], seq.numpy())


# --------------------------------------------------------------------------- #
# 4. batch greedy vs reference-style torch loop
# --------------------------------------------------------------------------- #


@requires_reference
def test_greedy_parity(ref, torch, tiny_cfg):
    model = make_ref_mlm(ref, torch, tiny_cfg, seed=13)
    state = to_numpy_state(torch, model)
    params = jax.tree.map(jnp.asarray, convert_bert_mlm(state, tiny_cfg))

    g = torch.Generator().manual_seed(17)
    b = 3
    enc = torch.randn(b, 5, tiny_cfg.hidden_size, generator=g)
    enc_mask = torch.ones(b, 5, dtype=torch.long)
    enc_mask[2, 3:] = 0

    # torch oracle mirroring reference d_rxn_prediction.py:62-80
    product_input = torch.full((b, 1), 2)
    end_count = torch.zeros(b, 1).to(bool)
    with torch.no_grad():
        for _ in range(30):
            atts = torch.where(product_input == 0, 0, 1)
            logits = model(
                product_input, attention_mask=atts,
                encoder_hidden_states=enc, encoder_attention_mask=enc_mask,
                return_dict=True, is_decoder=True, return_logits=True,
            )[:, -1, :]
            output = torch.argmax(logits, dim=-1).unsqueeze(1)
            end_count = torch.logical_or(end_count, output == 3)
            if end_count.all():
                break
            product_input = torch.cat([product_input, output], dim=-1)
    want = product_input.numpy()

    got = jax.device_get(greedy_decode(
        params, tiny_cfg, jnp.asarray(enc.numpy()),
        jnp.asarray(enc_mask.numpy()), max_steps=30))
    # my seqs append the final SEP; truncate both at first SEP for comparison
    for i in range(b):
        w = want[i]
        w = w[: np.nonzero(w == 3)[0][0]] if 3 in w else w
        s = np.asarray(got["seqs"][i])
        s = s[: np.nonzero(s == 3)[0][0]] if 3 in s else s[s != 0]
        np.testing.assert_array_equal(s, w)
