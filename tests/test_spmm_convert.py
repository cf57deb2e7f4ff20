"""Full SPMM torch-checkpoint conversion: synthetic reference-style .ckpt
through load_spmm_params (file IO + key surgery + momentum twins)."""

import numpy as np
import pytest

from spmm_tpu.configs import BertArchConfig

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
TEXT_CFG = BertArchConfig(**TINY, add_cross_attention=True)
PROP_CFG = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
                          add_cross_attention=False)


@pytest.fixture(scope="module")
def torch():
    return pytest.importorskip("torch")


def build_reference_style_ckpt(torch, path):
    """Assemble a state_dict shaped like the reference SPMM checkpoint
    (SPMM_models.py:16-77), including momentum twins, queues, and the legacy
    ``property_unk`` name."""
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()

    def cfg(n_layers, vocab, cross):
        return ref.BertConfig(
            vocab_size=vocab, hidden_size=32, num_hidden_layers=n_layers,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, type_vocab_size=2, fusion_layer=2,
            encoder_width=32, add_cross_attention=cross, hidden_act="gelu",
            layer_norm_eps=1e-12, pad_token_id=0, hidden_dropout_prob=0.1,
            attention_probs_dropout_prob=0.1, autoregressive=0)

    torch.manual_seed(0)
    text = ref.BertForMaskedLM(config=cfg(4, 300, True))
    prop = ref.BertForMaskedLM(config=cfg(2, 1, False)).bert
    text_m = ref.BertForMaskedLM(config=cfg(4, 300, True))
    prop_m = ref.BertForMaskedLM(config=cfg(2, 1, False)).bert

    state = {}
    for prefix, mod in (("text_encoder.", text), ("property_encoder.", prop),
                        ("text_encoder_m.", text_m),
                        ("property_encoder_m.", prop_m)):
        for k, v in mod.state_dict().items():
            state[prefix + k] = v
    h = 32
    state["property_embed.weight"] = torch.randn(h, 1)
    state["property_embed.bias"] = torch.randn(h)
    state["property_cls"] = torch.randn(1, 1, h)
    state["property_unk"] = torch.randn(1, 1, h)      # legacy name
    state["property_mtr_head.0.weight"] = torch.randn(h, h)
    state["property_mtr_head.0.bias"] = torch.randn(h)
    state["property_mtr_head.2.weight"] = torch.ones(h)
    state["property_mtr_head.2.bias"] = torch.zeros(h)
    state["property_mtr_head.3.weight"] = torch.randn(1, h)
    state["property_mtr_head.3.bias"] = torch.randn(1)
    for name, dims in (("property_proj", (16, h)), ("text_proj", (16, h)),
                       ("itm_head", (2, 2 * h))):
        state[f"{name}.weight"] = torch.randn(*dims)
        state[f"{name}.bias"] = torch.randn(dims[0])
        state[f"{name}_m.weight"] = torch.randn(*dims)
        state[f"{name}_m.bias"] = torch.randn(dims[0])
    state["prop_queue"] = torch.randn(16, 64)
    state["text_queue"] = torch.randn(16, 64)
    state["queue_ptr"] = torch.zeros(1, dtype=torch.long)
    state["temp"] = torch.ones(()) * 0.07
    torch.save({"state_dict": state}, path)
    return state


def test_load_spmm_params_from_torch_ckpt(torch, tmp_path):
    from conftest import has_reference

    if not has_reference():
        pytest.skip("reference xbert needed to build the synthetic ckpt")
    path = str(tmp_path / "checkpoint_SPMM.ckpt")
    state = build_reference_style_ckpt(torch, path)

    from spmm_tpu.checkpoint.io import load_spmm_params

    params = load_spmm_params(path, text_cfg=TEXT_CFG, prop_cfg=PROP_CFG,
                              with_pretrain_heads=True, with_momentum=True)
    # key surgery: legacy property_unk -> property_mask
    np.testing.assert_array_equal(
        np.asarray(params["property_mask"]),
        state["property_unk"].numpy())
    # momentum twins present and correct
    np.testing.assert_array_equal(
        np.asarray(params["momentum"]["text_proj"]["w"]),
        state["text_proj_m.weight"].numpy().T)
    # transposed linear
    np.testing.assert_array_equal(
        np.asarray(params["property_embed"]["w"]),
        state["property_embed.weight"].numpy().T)
    # encoder layer count matches config (4 text / 2 property)
    assert len(params["text_encoder"]["bert"]["layers"]) == 4
    assert len(params["property_encoder"]["layers"]) == 2
    assert "cross_attn" in params["text_encoder"]["bert"]["layers"][2]
    assert "cross_attn" not in params["text_encoder"]["bert"]["layers"][0]


def test_pretrain_state_from_reference_is_resumable(torch, tmp_path):
    """--as_pretrain_state output must match the init_pretrain_state tree
    structure exactly (Orbax restores against that template on --resume)."""
    from conftest import has_reference

    if not has_reference():
        pytest.skip("reference xbert needed")
    import jax
    import jax.numpy as jnp

    from spmm_tpu.checkpoint.convert import load_torch_state_dict
    from spmm_tpu.configs import PretrainConfig
    from spmm_tpu.training.pretrain import (
        init_pretrain_state, pretrain_state_from_reference,
    )

    path = str(tmp_path / "ckpt.ckpt")
    raw = build_reference_style_ckpt(torch, path)
    state_dict = load_torch_state_dict(path)
    pcfg = PretrainConfig(embed_dim=16, queue_size=64)
    state = pretrain_state_from_reference(state_dict, pcfg, TEXT_CFG, PROP_CFG)

    template = init_pretrain_state(jax.random.PRNGKey(0), pcfg,
                                   TEXT_CFG, PROP_CFG)
    assert (jax.tree_util.tree_structure(state)
            == jax.tree_util.tree_structure(template))
    # queues restored from checkpoint buffers
    np.testing.assert_array_equal(np.asarray(state["queue"]["prop"]),
                                  raw["prop_queue"].numpy())
    assert float(state["params"]["temp"]) == pytest.approx(0.07)
    # EMA == momentum twins
    np.testing.assert_array_equal(
        np.asarray(state["ema"]["text_proj"]["w"]),
        raw["text_proj_m.weight"].numpy().T)


def test_verify_checkpoint_gate(torch, tmp_path):
    """The released-checkpoint golden gate (checkpoint/verify.py) on a
    synthetic reference-style ckpt at tiny size: converts, dual-runs
    SMILES->PV through the reference torch graph and our JAX path, and
    passes the 1e-4 gate.  The same command validates the real
    checkpoint_SPMM.ckpt the moment it lands (d_smiles2pv.py:109-165)."""
    from conftest import has_reference

    if not has_reference():
        pytest.skip("reference repo needed")
    from spmm_tpu.checkpoint.verify import verify_checkpoint
    from spmm_tpu.configs import BertArchConfig

    path = str(tmp_path / "ref.ckpt")
    build_reference_style_ckpt(torch, path)
    tiny = dict(vocab_size=300, hidden_size=32, num_hidden_layers=4,
                num_attention_heads=4, intermediate_size=64,
                max_position_embeddings=64, type_vocab_size=2,
                fusion_layer=2, encoder_width=32)
    text_cfg = BertArchConfig(**tiny, add_cross_attention=True)
    prop_cfg = BertArchConfig(**{**tiny, "vocab_size": 1,
                                 "num_hidden_layers": 2},
                              add_cross_attention=False)
    dev = verify_checkpoint(
        path, ["CC(=O)O", "c1ccccc1", "CCO"], tolerance=1e-4,
        text_cfg=text_cfg, prop_cfg=prop_cfg, n_properties=5)
    assert dev <= 1e-4
