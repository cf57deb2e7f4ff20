"""Tensor parallelism: Megatron-layout param sharding over a dp x tp mesh
must be bit-compatible (to fp32 reduction tolerance) with single-device
execution of the SAME jitted functions.

The reference has no TP at all (SURVEY §2.3 — DDP only); this is framework
capability beyond parity, tested the TPU-native way on the 8-device virtual
CPU mesh (conftest.py).  The key property under test: ``shard_params_tp``
alone changes the layout — no model code changes, GSPMD inserts the
per-block all-reduces.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spmm_tpu.configs import BertArchConfig, FinetuneConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.parallel.mesh import DP_AXIS
from spmm_tpu.parallel.tp import (
    TP_AXIS,
    assert_tp_compatible,
    dp_tp_mesh,
    shard_params_tp,
    tp_param_specs,
)

TINY = dict(
    vocab_size=300, hidden_size=48, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=96, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=48,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return BertArchConfig(**TINY, add_cross_attention=True)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return dp_tp_mesh(dp=2, tp=4)


def test_spec_rules(tiny_cfg):
    params = jbert.init_mlm_params(jax.random.PRNGKey(0), tiny_cfg)
    specs = tp_param_specs(params)
    layer = specs["bert"]["layers"][0]
    assert layer["self_attn"]["q"]["w"] == P(None, TP_AXIS)
    assert layer["self_attn"]["q"]["b"] == P(TP_AXIS)
    assert layer["self_attn"]["out"]["w"] == P(TP_AXIS, None)
    assert layer["self_attn"]["out"]["b"] == P()
    assert layer["mlp"]["up"]["w"] == P(None, TP_AXIS)
    assert layer["mlp"]["down"]["w"] == P(TP_AXIS, None)
    assert layer["mlp"]["ln"]["scale"] == P()
    # fusion layers carry the same rule on cross-attention
    fusion = specs["bert"]["layers"][tiny_cfg.fusion_layer]
    assert fusion["cross_attn"]["v"]["w"] == P(None, TP_AXIS)
    assert fusion["cross_attn"]["out"]["w"] == P(TP_AXIS, None)
    # embeddings + LM head replicated (tied head: the decoder weight IS the
    # embedding table, so only the aliased bias remains in the head)
    assert specs["bert"]["embeddings"]["word"] == P()
    assert "w" not in specs["mlm_head"]["decoder"]
    assert specs["mlm_head"]["decoder"]["b"] == P()


def test_assert_tp_compatible(tiny_cfg):
    assert_tp_compatible(tiny_cfg, 4)
    with pytest.raises(ValueError):
        assert_tp_compatible(tiny_cfg, 3)


def test_mlm_forward_tp_matches_replicated(tiny_cfg, mesh):
    params = jbert.init_mlm_params(jax.random.PRNGKey(1), tiny_cfg)
    b, L = 8, 12
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, L), 4, 300)
    mask = jnp.ones((b, L), jnp.int32)

    f = jax.jit(lambda p, i, m: jbert.mlm_forward(
        p, tiny_cfg, input_ids=i, attention_mask=m, mode="multi_modal",
        encoder_hidden_states=jnp.zeros((b, 6, tiny_cfg.hidden_size)),
        is_decoder=True))
    single = np.asarray(f(params, ids, mask))

    params_tp = shard_params_tp(params, mesh)
    batch_shd = NamedSharding(mesh, P(DP_AXIS))
    sharded = np.asarray(f(params_tp,
                           jax.device_put(ids, batch_shd),
                           jax.device_put(mask, batch_shd)))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=0)


def test_downstream_train_step_tp_matches_single(tiny_cfg, mesh):
    """Two AdamW steps of the classification fine-tune, tp-sharded params +
    optimizer state vs single-device: identical losses and final params."""
    from spmm_tpu.models.downstream import init_downstream_params
    from spmm_tpu.training.finetune import make_downstream_step

    fcfg = FinetuneConfig(epochs=2, batch_size_train=8)
    params = init_downstream_params(jax.random.PRNGKey(3), "classification",
                                    cfg=tiny_cfg)
    tx, step = make_downstream_step("classification", fcfg,
                                    steps_per_epoch=4, cfg=tiny_cfg)

    b, L = 8, 10
    batches = []
    for i in range(2):
        k = jax.random.PRNGKey(10 + i)
        batches.append({
            "ids": jax.random.randint(k, (b, L), 4, 300),
            "mask": jnp.ones((b, L), jnp.int32),
            "target": jax.random.randint(jax.random.fold_in(k, 1), (b,), 0, 2),
        })

    def run(p, put):
        p = put(p)
        opt_state = jax.jit(tx.init)(p)
        losses = []
        for gs, batch in enumerate(batches):
            p, opt_state, m = step(p, opt_state, jnp.asarray(gs),
                                   {k: put(v) for k, v in batch.items()},
                                   jax.random.PRNGKey(0))
            losses.append(float(m["loss"]))
        return losses, jax.device_get(p)

    losses_1, params_1 = run(params, lambda x: x)
    batch_shd = NamedSharding(mesh, P(DP_AXIS))

    def put_tp(x):
        if isinstance(x, dict):
            return shard_params_tp(x, mesh)
        return jax.device_put(x, batch_shd)

    losses_tp, params_tp = run(params, put_tp)

    np.testing.assert_allclose(losses_tp, losses_1, atol=1e-5, rtol=0)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-5,
                                                         rtol=0),
                 params_tp, params_1)


@pytest.mark.slow
def test_pretrain_step_dp_tp_matches_dp(tiny_cfg):
    """The FULL pretrain train step (shard_map manual over dp, GSPMD-auto
    over tp) on a dp=4 x tp=2 mesh must match the 1-D dp=4 mesh exactly:
    the dp semantics (per-shard negatives, queue order) depend only on the
    dp extent, and tp is a pure layout change."""
    from spmm_tpu.configs import PretrainConfig
    from spmm_tpu.parallel.mesh import data_parallel_mesh
    from spmm_tpu.parallel.tp import tp_shardings
    from spmm_tpu.training.pretrain import (
        init_pretrain_state, make_pretrain_step,
    )

    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    pcfg = PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                          warmup_epochs=2)
    state = init_pretrain_state(jax.random.PRNGKey(0), pcfg, tiny_cfg,
                                prop_cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "prop": jax.random.normal(k2, (8, 53)),
        "ids": jax.random.randint(k1, (8, 12), 4, 300).at[:, 0].set(2),
        "mask": jnp.ones((8, 12), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    mesh_dp = data_parallel_mesh(4)
    step_dp = make_pretrain_step(mesh_dp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg)
    s_dp, m_dp = step_dp(state, batch, rng)

    mesh_tp = dp_tp_mesh(dp=4, tp=2)
    step_tp = make_pretrain_step(mesh_tp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg)
    state_tp = jax.device_put(state, tp_shardings(state, mesh_tp))
    s_tp, m_tp = step_tp(state_tp, batch, rng)

    np.testing.assert_allclose(float(m_tp["loss"]), float(m_dp["loss"]),
                               atol=1e-5, rtol=0)
    assert int(s_tp["queue"]["ptr"]) == int(s_dp["queue"]["ptr"]) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=0),
        jax.device_get(s_tp["params"]), jax.device_get(s_dp["params"]))
    np.testing.assert_allclose(
        np.asarray(s_tp["queue"]["prop"]), np.asarray(s_dp["queue"]["prop"]),
        atol=1e-5, rtol=0)


def test_pretrain_zero1_tp_rejected(tiny_cfg):
    from spmm_tpu.configs import PretrainConfig
    from spmm_tpu.training.pretrain import make_pretrain_step

    with pytest.raises(ValueError, match="zero1"):
        make_pretrain_step(dp_tp_mesh(dp=4, tp=2),
                           PretrainConfig(zero1=True), steps_per_epoch=10,
                           text_cfg=tiny_cfg, prop_cfg=tiny_cfg)


def test_predict_pv_dp_tp_matches_single(tiny_cfg, mesh):
    """The full smiles2pv 53-step (here 5-step) decode under dp x tp."""
    from spmm_tpu.inference.smiles2pv import predict_pv
    from spmm_tpu.models.spmm import init_spmm_params

    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    params = init_spmm_params(jax.random.PRNGKey(5), text_cfg=tiny_cfg,
                              prop_cfg=prop_cfg, with_pretrain_heads=False)
    b, L = 8, 12
    ids = jax.random.randint(jax.random.PRNGKey(6), (b, L), 4, 300)
    mask = jnp.ones((b, L), jnp.int32)

    single = np.asarray(predict_pv(params, ids, mask, text_cfg=tiny_cfg,
                                   prop_cfg=prop_cfg, n_properties=5))
    batch_shd = NamedSharding(mesh, P(DP_AXIS))
    sharded = np.asarray(predict_pv(
        shard_params_tp(params, mesh),
        jax.device_put(ids, batch_shd), jax.device_put(mask, batch_shd),
        text_cfg=tiny_cfg, prop_cfg=prop_cfg, n_properties=5))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=0)
