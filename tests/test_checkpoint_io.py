"""Orbax checkpoint round-trip + converter key-surgery tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.checkpoint.convert import apply_key_surgery
from spmm_tpu.checkpoint.io import restore_checkpoint, save_checkpoint
from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.training.pretrain import init_pretrain_state

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=1, encoder_width=32,
)


def test_orbax_roundtrip(tmp_path):
    text_cfg = BertArchConfig(**TINY, add_cross_attention=True)
    prop_cfg = BertArchConfig(**{**TINY, "vocab_size": 1},
                              add_cross_attention=False)
    pcfg = PretrainConfig(embed_dim=8, queue_size=32)
    state = init_pretrain_state(jax.random.PRNGKey(0), pcfg, text_cfg,
                                prop_cfg)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)
    flat1 = jax.tree.leaves(state)
    flat2 = jax.tree.leaves(restored)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_saver_roundtrip(tmp_path):
    """AsyncSaver writes the same format as save_checkpoint — a
    restore_checkpoint of an async write must round-trip, including
    overlapping saves (Orbax serializes them)."""
    from spmm_tpu.checkpoint.io import AsyncSaver

    text_cfg = BertArchConfig(**TINY, add_cross_attention=True)
    prop_cfg = BertArchConfig(**{**TINY, "vocab_size": 1},
                              add_cross_attention=False)
    pcfg = PretrainConfig(embed_dim=8, queue_size=32)
    state = init_pretrain_state(jax.random.PRNGKey(1), pcfg, text_cfg,
                                prop_cfg)
    with AsyncSaver() as saver:
        saver.save(str(tmp_path / "a"), state)
        saver.save(str(tmp_path / "b"), state)   # overlaps the first
    restored = restore_checkpoint(str(tmp_path / "b"), state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_key_surgery():
    state = {
        "text_encoder.bert.x": np.zeros(1),
        "text_encoder_m.bert.x": np.zeros(1),
        "prop_queue": np.zeros(1),
        "queue_ptr": np.zeros(1),
        "property_unk": np.ones(1),
        "property_encoder.embeddings.word_embeddings.weight": np.zeros(1),
        "itm_head.weight": np.zeros(1),
    }
    out = apply_key_surgery(state)
    assert "prop_queue" not in out and "queue_ptr" not in out
    assert "property_mask" in out and "property_unk" not in out

    out = apply_key_surgery(state, drop_property_word_embeddings=True)
    assert not any("word_embeddings" in k for k in out)

    out = apply_key_surgery(state, drop_momentum=True, drop_property=True)
    assert "text_encoder_m.bert.x" not in out
    assert not any("property" in k for k in out)

    out = apply_key_surgery(state, strip_prefix="text_encoder.")
    assert set(out) == {"bert.x"}
