"""Sequence parallelism (Megatron-SP, parallel/sp.py): seq-sharding the
residual-stream LayerNorm/dropout regions over the 'tp' group must be a pure
layout change — numerics identical to the unconstrained run.

The reference has no SP at all (SURVEY §2.3 — sequences are <=100 tokens and
its only axis is DDP); this is framework capability beyond parity, tested on
the 8-device virtual CPU mesh (conftest.py).  Two compositions are covered:
the pure-GSPMD form (batch_axis='dp', no shard_map) and the pretrain step's
manual-dp shard_map with the constraint twin mesh (sp.py module docs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.parallel.mesh import DP_AXIS, data_parallel_mesh
from spmm_tpu.parallel.sp import constrain, sequence_parallel
from spmm_tpu.parallel.tp import dp_tp_mesh, shard_params_tp, tp_shardings
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
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return dp_tp_mesh(dp=2, tp=4)


def test_constrain_is_identity_outside_context():
    x = jnp.ones((2, 8, 4))
    assert constrain(x) is x


def test_sequence_parallel_requires_tp_axis():
    with pytest.raises(ValueError, match="no 'tp' axis"):
        with sequence_parallel(data_parallel_mesh(4)):
            pass


def test_sp_pretrain_step_requires_tp_mesh(tiny_cfg):
    with pytest.raises(ValueError, match="requires a mesh with a 'tp' axis"):
        make_pretrain_step(data_parallel_mesh(4), PretrainConfig(),
                           steps_per_epoch=10, text_cfg=tiny_cfg,
                           prop_cfg=tiny_cfg, sp=True)


def test_mlm_forward_sp_matches_replicated(tiny_cfg, mesh):
    """Pure-GSPMD form: mlm forward with seq-sharded residual stream ==
    single-device, full fusion/decoder/cross-attn surface exercised."""
    params = jbert.init_mlm_params(jax.random.PRNGKey(1), tiny_cfg)
    b, L = 8, 16
    ids = jax.random.randint(jax.random.PRNGKey(2), (b, L), 4, 300)
    mask = jnp.ones((b, L), jnp.int32)
    enc = jnp.zeros((b, 6, tiny_cfg.hidden_size))

    def fwd(p, i, m):
        return jbert.mlm_forward(
            p, tiny_cfg, input_ids=i, attention_mask=m, mode="multi_modal",
            encoder_hidden_states=enc, is_decoder=True)

    single = np.asarray(jax.jit(fwd)(params, ids, mask))

    params_tp = shard_params_tp(params, mesh)
    batch_shd = NamedSharding(mesh, P(DP_AXIS))
    with sequence_parallel(mesh, batch_axis=DP_AXIS):
        sharded = np.asarray(jax.jit(fwd)(
            params_tp, jax.device_put(ids, batch_shd),
            jax.device_put(mask, batch_shd)))
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=0)


@pytest.mark.slow
def test_pretrain_step_sp_matches_dp(tiny_cfg):
    """The FULL pretrain step with sp=True on dp=4 x tp=2 (manual-dp
    shard_map + constraint-twin mesh) must match the 1-D dp=4 mesh."""
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
        "ids": jax.random.randint(k1, (8, 16), 4, 300).at[:, 0].set(2),
        "mask": jnp.ones((8, 16), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)

    mesh_dp = data_parallel_mesh(4)
    step_dp = make_pretrain_step(mesh_dp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg)
    s_dp, m_dp = step_dp(state, batch, rng)

    mesh_tp = dp_tp_mesh(dp=4, tp=2)
    step_sp = make_pretrain_step(mesh_tp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg,
                                 sp=True)
    state_sp = jax.device_put(state, tp_shardings(state, mesh_tp))
    s_sp, m_sp = step_sp(state_sp, batch, rng)

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_dp["loss"]),
                               atol=1e-5, rtol=0)
    assert int(s_sp["queue"]["ptr"]) == int(s_dp["queue"]["ptr"]) == 8
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=0),
        jax.device_get(s_sp["params"]), jax.device_get(s_dp["params"]))


def _tiny_pretrain_fixture():
    prop_cfg = BertArchConfig(
        **{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
        add_cross_attention=False)
    tiny_cfg = BertArchConfig(**TINY, add_cross_attention=True)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    batch = {
        "prop": jax.random.normal(k2, (8, 53)),
        "ids": jax.random.randint(k1, (8, 16), 4, 300).at[:, 0].set(2),
        "mask": jnp.ones((8, 16), jnp.int32),
    }
    return tiny_cfg, prop_cfg, batch


@pytest.mark.slow
def test_pretrain_step_sp_composes_with_remat_and_accum():
    """sp=True is a pure layout change under the CLI-reachable composition
    --remat --accum 2 too: dp=4 x tp=2 + sp == 1-D dp=4, same flags."""
    tiny_cfg, prop_cfg, batch = _tiny_pretrain_fixture()
    pcfg = PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                          warmup_epochs=2, remat=True)
    state = init_pretrain_state(jax.random.PRNGKey(0), pcfg, tiny_cfg,
                                prop_cfg)
    rng = jax.random.PRNGKey(2)

    step_dp = make_pretrain_step(data_parallel_mesh(4), pcfg,
                                 steps_per_epoch=10, text_cfg=tiny_cfg,
                                 prop_cfg=prop_cfg, accum=2)
    s_dp, m_dp = step_dp(state, batch, rng)

    mesh_tp = dp_tp_mesh(dp=4, tp=2)
    step_sp = make_pretrain_step(mesh_tp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg,
                                 accum=2, sp=True)
    state_sp = jax.device_put(state, tp_shardings(state, mesh_tp))
    s_sp, m_sp = step_sp(state_sp, batch, rng)

    np.testing.assert_allclose(float(m_sp["loss"]), float(m_dp["loss"]),
                               atol=1e-5, rtol=0)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=0),
        jax.device_get(s_sp["params"]), jax.device_get(s_dp["params"]))


@pytest.mark.slow
def test_pretrain_step_sp_bf16_smoke():
    """--bf16 --tp 2 --sp compiles and produces a finite loss (bf16 changes
    reduction numerics, so this is a smoke test, not an equivalence test)."""
    tiny_cfg, prop_cfg, batch = _tiny_pretrain_fixture()
    pcfg = PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                          warmup_epochs=2, bf16_compute=True)
    state = init_pretrain_state(jax.random.PRNGKey(0), pcfg, tiny_cfg,
                                prop_cfg)
    mesh_tp = dp_tp_mesh(dp=4, tp=2)
    step_sp = make_pretrain_step(mesh_tp, pcfg, steps_per_epoch=10,
                                 text_cfg=tiny_cfg, prop_cfg=prop_cfg,
                                 sp=True)
    state_sp = jax.device_put(state, tp_shardings(state, mesh_tp))
    s_sp, m_sp = step_sp(state_sp, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(m_sp["loss"]))
    assert int(s_sp["step"]) == 1
