"""ZeRO-3 / FSDP: fully-sharded state over a dp x fsdp mesh must be
numerically identical to the 1-D dp mesh with the SAME dp extent.

The reference has no parameter sharding at all (plain DDP replicates
params/grads/optimizer/EMA everywhere, reference SPMM_pretrain.py:35-36;
SURVEY §2.3 "ZeRO/FSDP: NO"); this is framework capability beyond parity,
tested the TPU-native way on the 8-device virtual CPU mesh.  The key
property: ``shard_state_fsdp`` alone changes the layout — GSPMD derives
the gather/reduce-scatter schedule, no model or step code changes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.parallel.fsdp import (
    FSDP_AXIS,
    dp_fsdp_mesh,
    fsdp_param_specs,
    fsdp_state_shardings,
    shard_state_fsdp,
)
from spmm_tpu.parallel.mesh import data_parallel_mesh
from spmm_tpu.training.pretrain import init_pretrain_state, make_pretrain_step

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return BertArchConfig(**TINY, add_cross_attention=True)


@pytest.fixture(scope="module")
def prop_cfg():
    return BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)


@pytest.fixture(scope="module")
def pcfg():
    return PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                          warmup_epochs=2)


@pytest.fixture(scope="module")
def state(tiny_cfg, prop_cfg, pcfg):
    return init_pretrain_state(jax.random.PRNGKey(0), pcfg, tiny_cfg,
                               prop_cfg)


def test_spec_rules(state):
    specs = fsdp_param_specs(state["params"], fsdp_size=4)
    # word embeddings [300, 48]: 300 % 4 == 0 and 300 > 48 -> dim 0
    assert specs["text_encoder"]["bert"]["embeddings"]["word"] == P(FSDP_AXIS, None)
    # square weights [48, 48]: tie -> later (minor) dim
    layer = specs["text_encoder"]["bert"]["layers"][0]
    assert layer["self_attn"]["q"]["w"] == P(None, FSDP_AXIS)
    # biases [48] shard too (ZeRO-3 shards everything it can)
    assert layer["self_attn"]["q"]["b"] == P(FSDP_AXIS)
    # scalars and non-dividing dims stay replicated
    assert specs["temp"] == P()
    specs53 = fsdp_param_specs({"v": jnp.zeros((53,))}, fsdp_size=4)
    assert specs53["v"] == P()


def test_at_rest_memory_is_sharded(state):
    mesh = dp_fsdp_mesh(dp=2, fsdp=4)
    sharded = shard_state_fsdp(state, mesh)
    emb = sharded["params"]["text_encoder"]["bert"]["embeddings"]["word"]
    shard_rows = emb.addressable_shards[0].data.shape[0]
    assert shard_rows == emb.shape[0] // 4
    # optimizer moments shard with the params
    mu_leaves = [x for x in jax.tree.leaves(sharded["opt_state"])
                 if getattr(x, "ndim", 0) == 2 and x.shape == emb.shape]
    assert mu_leaves, "Adam moments mirroring the embedding not found"
    assert mu_leaves[0].addressable_shards[0].data.shape[0] == \
        emb.shape[0] // 4
    # the queue stays replicated (modular scatter each step)
    q = sharded["queue"]["prop"]
    assert q.addressable_shards[0].data.shape == q.shape


@pytest.mark.slow
def test_pretrain_step_dp_fsdp_matches_dp(tiny_cfg, prop_cfg, pcfg, state):
    """The FULL pretrain step (shard_map manual over dp, GSPMD-auto over
    fsdp) on dp=2 x fsdp=4 must match the 1-D dp=2 mesh exactly: dp
    semantics (per-shard negatives, rng folds, queue order) depend only on
    the dp extent; fsdp is a pure layout change.  Runs TWO steps through
    the same AOT executable — exactly the CLI's execution mode — so an
    output-sharding drift would fail the second call."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "prop": jax.random.normal(k2, (8, 53)),
        "ids": jax.random.randint(k1, (8, 12), 4, 300).at[:, 0].set(2),
        "mask": jnp.ones((8, 12), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    def run_two(mesh, put, state_shardings=None):
        s = put(state)
        step = make_pretrain_step(mesh, pcfg, steps_per_epoch=10,
                                  text_cfg=tiny_cfg, prop_cfg=prop_cfg,
                                  state_shardings=state_shardings)
        compiled = step.lower(s, batch, rng).compile()
        s1, m1 = compiled(s, batch, rng)
        s2, m2 = compiled(s1, batch, jax.random.fold_in(rng, 7))
        return s2, (float(m1["loss"]), float(m2["loss"]))

    mesh_dp = data_parallel_mesh(2)
    from spmm_tpu.parallel.mesh import replicated
    s_dp, losses_dp = run_two(
        mesh_dp, lambda s: jax.device_put(s, replicated(mesh_dp)))

    mesh_f = dp_fsdp_mesh(dp=2, fsdp=4)
    s_f, losses_f = run_two(mesh_f, lambda s: shard_state_fsdp(s, mesh_f),
                            state_shardings=fsdp_state_shardings(state,
                                                                 mesh_f))

    np.testing.assert_allclose(losses_f, losses_dp, atol=1e-5, rtol=0)
    assert int(s_f["queue"]["ptr"]) == int(s_dp["queue"]["ptr"]) == 16
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=0),
        jax.device_get(s_f["params"]), jax.device_get(s_dp["params"]))
    np.testing.assert_allclose(
        np.asarray(s_f["queue"]["prop"]), np.asarray(s_dp["queue"]["prop"]),
        atol=1e-5, rtol=0)


def test_pretrain_zero1_fsdp_rejected(tiny_cfg, pcfg):
    with pytest.raises(ValueError, match="zero1"):
        make_pretrain_step(dp_fsdp_mesh(dp=2, fsdp=4),
                           PretrainConfig(zero1=True), steps_per_epoch=10,
                           text_cfg=tiny_cfg, prop_cfg=tiny_cfg)


def test_cli_flag_validation():
    from spmm_tpu.cli.pretrain import main
    with pytest.raises(SystemExit):
        main(["--data_path", "/nonexistent", "--fsdp", "4", "--tp", "2"])
    with pytest.raises(SystemExit):
        main(["--data_path", "/nonexistent", "--fsdp", "4", "--zero1"])
