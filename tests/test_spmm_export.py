"""JAX -> torch checkpoint exporter (checkpoint/export.py): the inverse of
the converter.  convert(export(params)) must reproduce the tree exactly,
the exported key surface must match a reference-style checkpoint's module
weights, and the reference torch modules must load an exported checkpoint
without unexpected keys."""

import numpy as np
import pytest

import jax

from spmm_tpu.checkpoint.export import (
    export_spmm_state_dict, save_torch_checkpoint,
)
from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models.spmm import convert_spmm_checkpoint, init_spmm_params
from conftest import has_reference

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
TEXT_CFG = BertArchConfig(**TINY, add_cross_attention=True)
PROP_CFG = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
                          add_cross_attention=False)


def _params(with_momentum: bool = False):
    params = init_spmm_params(jax.random.PRNGKey(0), text_cfg=TEXT_CFG,
                              prop_cfg=PROP_CFG, embed_dim=16,
                              with_pretrain_heads=True)
    if with_momentum:
        from spmm_tpu.models import bert as jbert

        ks = jax.random.split(jax.random.PRNGKey(1), 4)
        params["momentum"] = {
            "text_encoder": jbert.init_mlm_params(ks[0], TEXT_CFG),
            "property_encoder": jbert.init_bert_params(ks[1], PROP_CFG),
            "property_proj": jbert._init_linear(ks[2], 32, 16, 0.02),
            "text_proj": jbert._init_linear(ks[3], 32, 16, 0.02),
        }
    return params


@pytest.mark.parametrize("with_momentum", [False, True])
def test_roundtrip_exact(with_momentum):
    params = _params(with_momentum)
    state = export_spmm_state_dict(params, TEXT_CFG, PROP_CFG)
    back = convert_spmm_checkpoint(state, TEXT_CFG, PROP_CFG,
                                   with_pretrain_heads=True,
                                   with_momentum=with_momentum)
    flat_a, tree_a = jax.tree.flatten_with_path(params)
    flat_b, tree_b = jax.tree.flatten_with_path(back)
    assert tree_a == tree_b
    for (path_a, leaf_a), (_, leaf_b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(leaf_a, np.float32),
                                      np.asarray(leaf_b, np.float32),
                                      err_msg=str(path_a))


def test_convert_checkpoint_cli_to_torch_roundtrip(tmp_path):
    """Orbax params dir --to_torch-> reference .ckpt -> load_spmm_params
    must reproduce the tree (the full CLI reverse-export path)."""
    pytest.importorskip("torch")
    from spmm_tpu.checkpoint.io import load_spmm_params, save_checkpoint
    from spmm_tpu.cli.convert_checkpoint import main

    params = _params()
    orbax_dir = str(tmp_path / "orbax")
    out_ckpt = str(tmp_path / "exported.ckpt")
    save_checkpoint(orbax_dir, params)
    main(["--torch_ckpt", orbax_dir, "--out", out_ckpt, "--to_torch"])
    back = load_spmm_params(out_ckpt, text_cfg=TEXT_CFG, prop_cfg=PROP_CFG,
                            with_pretrain_heads=True)
    flat_a, tree_a = jax.tree.flatten_with_path(params)
    flat_b, tree_b = jax.tree.flatten_with_path(back)
    assert tree_a == tree_b
    for (path_a, leaf_a), (_, leaf_b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(leaf_a, np.float32),
                                      np.asarray(leaf_b, np.float32),
                                      err_msg=str(path_a))


@pytest.mark.skipif(not has_reference(), reason="reference repo needed")
def test_key_surface_matches_reference_checkpoint(tmp_path):
    """Exported key set == a reference-style checkpoint's module weights
    (after its load-time surgery: queues/temp dropped, _unk renamed)."""
    torch = pytest.importorskip("torch")
    from test_spmm_convert import build_reference_style_ckpt

    ref_state = build_reference_style_ckpt(torch, str(tmp_path / "ref.ckpt"))
    # the synthetic builder over-approximates with an itm_head momentum
    # twin; the real reference has none (model_pairs are property/text
    # encoder + proj only, reference SPMM_models.py:55-59)
    ref_keys = {k.replace("_unk", "_mask") for k in ref_state
                if "queue" not in k and k != "temp"
                and not k.startswith("itm_head_m")
                and not k.endswith("position_ids")}
    got = set(export_spmm_state_dict(_params(with_momentum=True),
                                     TEXT_CFG, PROP_CFG))
    assert got == ref_keys, (sorted(got - ref_keys)[:5],
                             sorted(ref_keys - got)[:5])


@pytest.mark.skipif(not has_reference(), reason="reference repo needed")
def test_reference_modules_load_export(tmp_path):
    """The reference torch modules must accept an exported checkpoint:
    no unexpected keys, nothing missing beyond non-weight buffers."""
    torch = pytest.importorskip("torch")
    from reference_shim import import_reference_xbert

    ref = import_reference_xbert()
    path = str(tmp_path / "export.ckpt")
    save_torch_checkpoint(path, _params(), TEXT_CFG, PROP_CFG)
    state = torch.load(path, weights_only=False)["state_dict"]

    cfg = ref.BertConfig(
        vocab_size=300, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2, fusion_layer=2,
        encoder_width=32, add_cross_attention=True, hidden_act="gelu",
        layer_norm_eps=1e-12, pad_token_id=0, hidden_dropout_prob=0.1,
        attention_probs_dropout_prob=0.1, autoregressive=0)
    text = ref.BertForMaskedLM(config=cfg)
    sub = {k[len("text_encoder."):]: v for k, v in state.items()
           if k.startswith("text_encoder.")}
    result = text.load_state_dict(sub, strict=False)
    assert result.unexpected_keys == []
    assert all(k.endswith("position_ids") for k in result.missing_keys), (
        result.missing_keys)
    # loaded means numerically adopted, not silently skipped
    w = text.bert.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_array_equal(
        w, np.asarray(sub["bert.embeddings.word_embeddings.weight"]))
