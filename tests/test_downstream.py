"""Downstream model tests: truncation equivalence, losses, train step, and
pretrain-checkpoint loading."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, FinetuneConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.models.downstream import (
    downstream_forward, downstream_loss, init_downstream_params,
    load_encoder_from_pretrain, truncated_text_config,
)
from spmm_tpu.training.finetune import make_downstream_step

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
CFG = BertArchConfig(**TINY, add_cross_attention=True)


def batch(bs=4, L=10, seed=0):
    k = jax.random.PRNGKey(seed)
    ids = jax.random.randint(k, (bs, L), 4, 300).at[:, 0].set(2)
    mask = jnp.ones((bs, L), jnp.int32)
    return ids, mask


def test_truncated_encoder_matches_full_text_mode():
    """Truncated params + mode='text' == full 12-layer params + mode='text'
    (the reference's Identity-replacement, d_classification.py:33)."""
    full = jbert.init_bert_params(jax.random.PRNGKey(0), CFG)
    tcfg = truncated_text_config(CFG)
    trunc = {"embeddings": full["embeddings"],
             "layers": full["layers"][: CFG.fusion_layer]}
    ids, mask = batch()
    out_full = jbert.bert_forward(full, CFG, input_ids=ids,
                                  attention_mask=mask, mode="text")
    out_trunc = jbert.bert_forward(trunc, tcfg, input_ids=ids,
                                   attention_mask=mask, mode="text")
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_trunc),
                               atol=1e-6)


@pytest.mark.parametrize("task,n_out,tgt", [
    ("classification", 2, lambda bs: jnp.zeros((bs,), jnp.int32)),
    ("multilabel", 5, lambda bs: jnp.zeros((bs, 5), jnp.float32)),
    ("regression", 1, lambda bs: jnp.zeros((bs,), jnp.float32)),
])
def test_forward_and_loss(task, n_out, tgt):
    params = init_downstream_params(jax.random.PRNGKey(1), task, CFG, n_out)
    ids, mask = batch()
    out = downstream_forward(params, CFG, ids, mask)
    expected_cols = {"classification": n_out, "multilabel": n_out,
                     "regression": 1}[task]
    assert out.shape == (4, expected_cols)
    loss = downstream_loss(params, CFG, task, ids, mask, tgt(4))
    assert np.isfinite(float(loss))


def test_train_step_moves_params():
    fcfg = FinetuneConfig(epochs=3, batch_size_train=4)
    params = init_downstream_params(jax.random.PRNGKey(2), "classification",
                                    CFG, 2)
    tx, step = make_downstream_step("classification", fcfg,
                                    steps_per_epoch=5, cfg=CFG)
    opt_state = tx.init(params)
    ids, mask = batch()
    b = {"ids": ids, "mask": mask, "target": jnp.array([0, 1, 0, 1])}
    p2, opt_state, metrics = step(params, opt_state, jnp.int32(0), b,
                                  jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert float(jnp.abs(p2["head"]["l2"]["w"]
                         - params["head"]["l2"]["w"]).max()) > 0
    assert float(jnp.abs(p2["encoder"]["embeddings"]["word"]
                         - params["encoder"]["embeddings"]["word"]).max()) > 0


def test_load_encoder_from_pretrain_state():
    """A pretrain-style state_dict (with _unk legacy key) loads into the
    truncated encoder."""
    import torch

    tcfg = truncated_text_config(CFG)
    rng = np.random.default_rng(0)
    state = {}

    def lin(prefix, din, dout):
        state[f"{prefix}.weight"] = rng.normal(size=(dout, din)).astype("f4")
        state[f"{prefix}.bias"] = rng.normal(size=(dout,)).astype("f4")

    def ln(prefix, d):
        state[f"{prefix}.weight"] = np.ones(d, "f4")
        state[f"{prefix}.bias"] = np.zeros(d, "f4")

    p = "text_encoder.bert"
    h, inter = tcfg.hidden_size, tcfg.intermediate_size
    state[f"{p}.embeddings.word_embeddings.weight"] = (
        rng.normal(size=(300, h)).astype("f4"))
    state[f"{p}.embeddings.position_embeddings.weight"] = (
        rng.normal(size=(64, h)).astype("f4"))
    state[f"{p}.embeddings.token_type_embeddings.weight"] = (
        rng.normal(size=(2, h)).astype("f4"))
    ln(f"{p}.embeddings.LayerNorm", h)
    for i in range(tcfg.num_hidden_layers):
        lp = f"{p}.encoder.layer.{i}"
        for q in ("query", "key", "value"):
            lin(f"{lp}.attention.self.{q}", h, h)
        lin(f"{lp}.attention.output.dense", h, h)
        ln(f"{lp}.attention.output.LayerNorm", h)
        lin(f"{lp}.intermediate.dense", h, inter)
        lin(f"{lp}.output.dense", inter, h)
        ln(f"{lp}.output.LayerNorm", h)
    state["property_unk"] = np.zeros((1, 1, h), "f4")  # legacy name

    params = init_downstream_params(jax.random.PRNGKey(3), "regression", CFG, 1)
    loaded = load_encoder_from_pretrain(params, state, CFG)
    np.testing.assert_array_equal(
        loaded["encoder"]["embeddings"]["word"],
        state[f"{p}.embeddings.word_embeddings.weight"])
    # head untouched
    np.testing.assert_array_equal(np.asarray(loaded["head"]["l1"]["w"]),
                                  np.asarray(params["head"]["l1"]["w"]))
