"""Pipeline parallelism (GPipe, parallel/pp.py): the microbatch-pipelined
forward of the truncated unimodal encoder must match sequential execution,
in values AND in gradients (the backward pipeline is derived by autodiff
through ppermute/scan).

The reference has no PP at all (SURVEY §2.3); beyond-parity capability,
tested on the 8-device virtual CPU mesh (conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.ops.masks import invert_encoder_mask
from spmm_tpu.parallel.pp import (
    pipeline_encoder_forward,
    pp_mesh,
    stack_stage_params,
)

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=8,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=8, encoder_width=48,
)


@pytest.fixture(scope="module")
def cfg():
    # text-only stack: all 8 layers self-attn (fusion_layer == num_layers)
    return BertArchConfig(**TINY, add_cross_attention=False)


@pytest.fixture(scope="module")
def setup(cfg):
    params = jbert.init_bert_params(jax.random.PRNGKey(0), cfg)
    b, L = 8, 12
    hidden = jax.random.normal(jax.random.PRNGKey(1), (b, L, cfg.hidden_size))
    mask = jnp.ones((b, L), jnp.int32)
    add_mask = invert_encoder_mask(mask)           # [B,1,1,L] additive
    add_mask = jnp.broadcast_to(add_mask, (b, 1, 1, L))
    sequential = jbert.encoder_forward(
        params, cfg, hidden, add_mask, mode="text")
    return params, hidden, add_mask, sequential


def test_stack_stage_params_shapes(cfg, setup):
    params = setup[0]
    stacked = stack_stage_params(params["layers"], 4)
    q = stacked["self_attn"]["q"]["w"]
    assert q.shape == (4, 2, cfg.hidden_size, cfg.hidden_size)
    with pytest.raises(ValueError, match="do not divide"):
        stack_stage_params(params["layers"], 3)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 8), (4, 4)])
def test_pp_forward_matches_sequential(cfg, setup, n_stages, n_micro):
    params, hidden, add_mask, sequential = setup
    stacked = stack_stage_params(params["layers"], n_stages)
    mesh = pp_mesh(n_stages)
    out = jax.jit(
        lambda st, h, m: pipeline_encoder_forward(
            st, cfg, h, m, mesh, n_microbatches=n_micro)
    )(stacked, hidden, add_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sequential),
                               atol=2e-5, rtol=0)


def test_pp_grads_match_sequential(cfg, setup):
    """jax.grad through the ppermute/scan schedule == sequential grads."""
    params, hidden, add_mask, _ = setup
    n_stages, n_micro = 4, 8

    def seq_loss(layers):
        out = jbert.encoder_forward({"layers": layers}, cfg, hidden,
                                    add_mask, mode="text")
        return jnp.sum(out ** 2)

    def pp_loss(stacked):
        out = pipeline_encoder_forward(stacked, cfg, hidden, add_mask,
                                       pp_mesh(n_stages),
                                       n_microbatches=n_micro)
        return jnp.sum(out ** 2)

    l_seq, g_seq = jax.jit(jax.value_and_grad(seq_loss))(params["layers"])
    stacked = stack_stage_params(params["layers"], n_stages)
    l_pp, g_pp = jax.jit(jax.value_and_grad(pp_loss))(stacked)

    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
    # unstack the stage-slab grads back to the per-layer list layout
    lps = len(params["layers"]) // n_stages
    for i in range(len(params["layers"])):
        g_i = jax.tree.map(lambda x: x[i // lps, i % lps], g_pp)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4, rtol=0),
            g_i, g_seq[i])


def test_pp_rejects_indivisible_batch(cfg, setup):
    params, hidden, add_mask, _ = setup
    stacked = stack_stage_params(params["layers"], 2)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_encoder_forward(stacked, cfg, hidden, add_mask,
                                 pp_mesh(2), n_microbatches=3)
