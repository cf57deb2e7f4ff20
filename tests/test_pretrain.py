"""Pretrain step tests: runs on the 8-device virtual CPU mesh, checks loss
composition, queue mechanics, EMA update, NaN-skip behavior, and determinism.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, PretrainConfig
from spmm_tpu.parallel.mesh import data_parallel_mesh
from spmm_tpu.training.pretrain import (
    EMA_KEYS, ema_update, init_pretrain_state, make_pretrain_step,
    pretrain_loss,
)
from spmm_tpu.configs import property_config, text_config

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=4,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=64,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)
TEXT_CFG = BertArchConfig(**TINY, add_cross_attention=True)
PROP_CFG = BertArchConfig(**{**TINY, "vocab_size": 1, "num_hidden_layers": 2},
                          add_cross_attention=False)
PCFG = PretrainConfig(embed_dim=16, queue_size=64, batch_size=2,
                      warmup_epochs=2)


def make_batch(rng, global_bs=16, L=12):
    k1, k2 = jax.random.split(jax.random.PRNGKey(rng))
    ids = jax.random.randint(k1, (global_bs, L), 4, 300)
    ids = ids.at[:, 0].set(2)
    mask = jnp.ones((global_bs, L), jnp.int32).at[3:, 9:].set(0)
    ids = ids * mask
    prop = jax.random.normal(k2, (global_bs, 53))
    return {"prop": prop, "ids": ids, "mask": mask}


@pytest.fixture(scope="module")
def state():
    return init_pretrain_state(jax.random.PRNGKey(0), PCFG, TEXT_CFG, PROP_CFG)


def test_loss_components_finite(state):
    batch = make_batch(1, global_bs=4)
    total, aux = pretrain_loss(
        state["params"], state["ema"], state["queue"], batch,
        jax.random.PRNGKey(1), jnp.float32(0.4), TEXT_CFG, PROP_CFG, PCFG,
        deterministic=True)
    parts = [aux[k] for k in ("loss_mlm", "loss_mpm", "loss_ita", "loss_itm")]
    assert all(np.isfinite(float(p)) for p in parts)
    np.testing.assert_allclose(float(total), sum(float(p) for p in parts),
                               rtol=1e-6)
    assert aux["prop_feat_m"].shape == (4, PCFG.embed_dim)
    # momentum features are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(aux["prop_feat_m"]), axis=-1), 1.0,
        atol=1e-5)


def test_train_step_on_mesh(state):
    mesh = data_parallel_mesh(8)
    step_fn = make_pretrain_step(mesh, PCFG, steps_per_epoch=10,
                                 text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    batch = make_batch(2, global_bs=16)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(3))
    assert not bool(metrics["skipped"])
    assert np.isfinite(float(metrics["loss"]))
    # params moved, step advanced, queue ptr advanced by the global batch
    assert int(new_state["step"]) == int(state["step"]) + 1
    assert int(new_state["queue"]["ptr"]) == 16
    before = state["params"]["text_proj"]["w"]
    after = new_state["params"]["text_proj"]["w"]
    assert float(jnp.abs(after - before).max()) > 0
    # queue columns [0:16) replaced by gathered momentum features
    q = np.asarray(new_state["queue"]["prop"][:, :16])
    np.testing.assert_allclose(np.linalg.norm(q, axis=0), 1.0, atol=1e-5)
    # at a fresh init EMA == params, so the first EMA update is a fixed point
    np.testing.assert_array_equal(
        np.asarray(new_state["ema"]["text_proj"]["w"]),
        np.asarray(state["ema"]["text_proj"]["w"]))

    # second step: ptr wraps, lr follows warmup, and EMA now drifts because
    # params moved in step 1
    s2, m2 = step_fn(new_state, make_batch(3, global_bs=16),
                     jax.random.PRNGKey(4))
    assert int(s2["queue"]["ptr"]) == 32
    assert float(m2["lr"]) > 0
    e0 = new_state["ema"]["text_proj"]["w"]
    e1 = s2["ema"]["text_proj"]["w"]
    assert float(jnp.abs(e1 - e0).max()) > 0


def test_ema_update_moves_toward_params(state):
    ema2 = ema_update(state["ema"], state["params"], momentum=0.5)
    w_p = state["params"]["text_proj"]["w"]
    w_e = state["ema"]["text_proj"]["w"]
    np.testing.assert_allclose(np.asarray(ema2["text_proj"]["w"]),
                               np.asarray(0.5 * w_e + 0.5 * w_p), atol=1e-7)
    assert set(ema2) == set(EMA_KEYS)


def test_nan_skip(state):
    mesh = data_parallel_mesh(8)
    step_fn = make_pretrain_step(mesh, PCFG, steps_per_epoch=10,
                                 text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    batch = make_batch(5, global_bs=16)
    batch["prop"] = batch["prop"].at[0, 0].set(jnp.nan)
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(6))
    assert bool(metrics["skipped"])
    # params and queue untouched; step still advances
    np.testing.assert_array_equal(
        np.asarray(new_state["params"]["text_proj"]["w"]),
        np.asarray(state["params"]["text_proj"]["w"]))
    assert int(new_state["queue"]["ptr"]) == int(state["queue"]["ptr"])
    assert int(new_state["step"]) == int(state["step"]) + 1


def test_bf16_remat_loss(state):
    """bf16_compute + remat variants produce finite losses close to fp32."""
    import dataclasses

    batch = make_batch(7, global_bs=4)
    base, _ = pretrain_loss(
        state["params"], state["ema"], state["queue"], batch,
        jax.random.PRNGKey(9), jnp.float32(0.4), TEXT_CFG, PROP_CFG, PCFG,
        deterministic=True)
    for kwargs in ({"bf16_compute": True}, {"remat": True},
                   {"bf16_compute": True, "remat": True}):
        pcfg2 = dataclasses.replace(PCFG, **kwargs)
        loss, _ = pretrain_loss(
            state["params"], state["ema"], state["queue"], batch,
            jax.random.PRNGKey(9), jnp.float32(0.4), TEXT_CFG, PROP_CFG,
            pcfg2, deterministic=True)
        assert np.isfinite(float(loss))
        tol = 0.2 if kwargs.get("bf16_compute") else 1e-4
        assert abs(float(loss) - float(base)) < tol, kwargs


def test_no_recompile_across_steps(state):
    """The step must compile exactly once (lr-leaf weak-type and state
    sharding are canonicalized); a second compile at full size costs ~7min
    on the TPU compile helper."""
    from spmm_tpu.parallel.mesh import replicated

    mesh = data_parallel_mesh(8)
    st = jax.device_put(state, replicated(mesh))
    step_fn = make_pretrain_step(mesh, PCFG, steps_per_epoch=10,
                                 text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    for i in range(3):
        st, _ = step_fn(st, make_batch(10 + i, global_bs=16),
                        jax.random.PRNGKey(i))
    assert step_fn._cache_size() == 1


def test_zero1_matches_replicated_and_stays_sharded(state):
    """ZeRO-1 (opt state + EMA sharded over dp) must produce the same step as
    the fully-replicated layout, and the updated state must keep the sharded
    layout (VERDICT r1 item 5: the memory lever for per-chip batch 96)."""
    import dataclasses

    from jax.sharding import PartitionSpec
    from spmm_tpu.parallel.mesh import replicated
    from spmm_tpu.training.pretrain import pretrain_state_shardings

    mesh = data_parallel_mesh(8)
    batch = make_batch(5, global_bs=16)

    base_fn = make_pretrain_step(mesh, PCFG, steps_per_epoch=10,
                                 text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    ref_state = jax.device_put(state, replicated(mesh))
    want_state, want_metrics = base_fn(ref_state, batch, jax.random.PRNGKey(9))

    z_pcfg = dataclasses.replace(PCFG, zero1=True)
    z_fn = make_pretrain_step(mesh, z_pcfg, steps_per_epoch=10,
                              text_cfg=TEXT_CFG, prop_cfg=PROP_CFG)
    z_state = jax.device_put(state, pretrain_state_shardings(state, mesh))
    got_state, got_metrics = z_fn(z_state, batch, jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(want_metrics["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got_state["params"]["text_proj"]["w"]),
        np.asarray(want_state["params"]["text_proj"]["w"]), atol=1e-6)

    # the updated optimizer moments and EMA keep the dp-sharded layout
    def leaf_spec(x):
        return x.sharding.spec if hasattr(x, "sharding") else None

    mu = got_state["opt_state"].inner_state[1][0].mu
    sharded_leaves = [
        x for x in jax.tree.leaves(mu)
        if x.ndim >= 1 and x.shape[0] % 8 == 0 and x.shape[0] >= 8]
    assert sharded_leaves, "expected shardable moment leaves"
    assert any(leaf_spec(x) == PartitionSpec("dp") for x in sharded_leaves)
    ema_w = got_state["ema"]["text_proj"]["w"]
    assert leaf_spec(ema_w) == PartitionSpec("dp")


def test_accum_matches_mean_of_microbatch_grads():
    """accum=N must produce exactly the mean of the N microbatch loss
    computations (same rng streams) and a queue updated with every
    microbatch's momentum features in global order.  Uses its own
    extra-small model: the step compiles the grad graph accum times."""
    nano = dict(TINY, hidden_size=16, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=32, fusion_layer=1,
                encoder_width=16)
    text_cfg = BertArchConfig(**nano, add_cross_attention=True)
    prop_cfg = BertArchConfig(**{**nano, "vocab_size": 1},
                              add_cross_attention=False)
    pcfg = PretrainConfig(embed_dim=8, queue_size=64, batch_size=2,
                          warmup_epochs=2)
    st = init_pretrain_state(jax.random.PRNGKey(0), pcfg, text_cfg, prop_cfg)

    mesh = data_parallel_mesh(8)
    accum = 2
    step_fn = make_pretrain_step(mesh, pcfg, steps_per_epoch=10,
                                 text_cfg=text_cfg, prop_cfg=prop_cfg,
                                 accum=accum)
    batch = make_batch(5, global_bs=16)
    rng = jax.random.PRNGKey(7)
    new_state, metrics = step_fn(st, batch, rng)
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state["queue"]["ptr"]) == 16
    # queue columns hold normalized momentum features from BOTH microbatches
    q = np.asarray(new_state["queue"]["prop"][:, :16])
    np.testing.assert_allclose(np.linalg.norm(q, axis=0), 1.0, atol=1e-5)

    # oracle: pmean-of-shards == plain mean of per-shard losses, so rebuild
    # the loss per (microbatch, shard) with the step's exact rng streams —
    # ONE small jit instead of another shard_map compile (slow under pytest)
    loss_fn = jax.jit(
        lambda p, e, q, b, r: pretrain_loss(
            p, e, q, b, r, jnp.float32(0.0), text_cfg, prop_cfg, pcfg)[0])
    ema = ema_update(st["ema"], st["params"], pcfg.momentum)
    n_dev = mesh.devices.size
    losses = []
    for i in range(accum):
        mb = jax.tree.map(
            lambda x: x.reshape((accum, 16 // accum) + x.shape[1:])[i], batch)
        r_i = jax.random.fold_in(rng, i)
        for d in range(n_dev):
            shard = jax.tree.map(
                lambda x: x.reshape((n_dev, -1) + x.shape[1:])[d], mb)
            losses.append(float(loss_fn(
                st["params"], ema, st["queue"], shard,
                jax.random.fold_in(r_i, d))))
    # alpha at step 0 is 0.0 (ramp), so the oracle uses alpha=0
    np.testing.assert_allclose(float(metrics["loss"]),
                               np.mean(losses), rtol=1e-5)
