"""Expert parallelism (GShard MoE, parallel/ep.py): the dense grouped-MoE
block must match a per-token python loop oracle, and the 'ep'-sharded
shard_map/all_to_all path must match the dense path in values AND in
gradients (the backward exchange is derived by autodiff through
all_to_all).

The reference has no MoE/EP at all (SURVEY §2.3); beyond-parity capability,
tested on the 8-device virtual CPU mesh (conftest.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.parallel.ep import (
    ep_mesh,
    expert_capacity,
    expert_parallel_moe_block,
    init_moe_params,
    moe_block,
    moe_shardings,
)

TINY = dict(
    vocab_size=300, hidden_size=32, num_hidden_layers=2,
    num_attention_heads=4, intermediate_size=64, max_position_embeddings=128,
    type_vocab_size=2, fusion_layer=2, encoder_width=32,
)


@pytest.fixture(scope="module")
def cfg():
    return BertArchConfig(**TINY, add_cross_attention=False)


@pytest.fixture(scope="module")
def setup(cfg):
    n_experts = 8
    params = init_moe_params(jax.random.PRNGKey(0), cfg, n_experts)
    hidden = jax.random.normal(jax.random.PRNGKey(1), (8, 6, cfg.hidden_size))
    return params, hidden, n_experts


def _loop_oracle(params, cfg, hidden, n_experts, top_k, capacity_factor,
                 n_groups):
    """Per-token numpy re-derivation of GShard routing + expert FFN."""
    p = jax.tree.map(np.asarray, params)
    b, s, h = hidden.shape
    tg = (b // n_groups) * s
    cap = expert_capacity(tg, n_experts, top_k, capacity_factor)
    tokens = np.asarray(hidden, np.float32).reshape(n_groups, tg, h)
    out = np.zeros_like(tokens)
    for g in range(n_groups):
        logits = tokens[g] @ p["router"]["w"]
        probs = np.asarray(jax.nn.softmax(jnp.asarray(logits), axis=-1))
        counts = np.zeros(n_experts, np.int64)
        # rank-r choices claim slots after kept ranks < r, each rank in
        # token order — walk rank-major, token-minor like the kernel
        chosen = [[] for _ in range(tg)]            # (expert, kept) per token
        masked = probs.copy()
        picks = np.zeros((top_k, tg), np.int64)
        for r in range(top_k):
            picks[r] = np.argmax(masked, axis=-1)
            masked[np.arange(tg), picks[r]] = 0.0
        # capacity: rank-major pass, but positions within a rank count ALL
        # rank-r tokens of that expert seen so far (uncapped cumsum)
        for r in range(top_k):
            seen = np.zeros(n_experts, np.int64)
            for t in range(tg):
                e = picks[r][t]
                kept = counts[e] + seen[e] < cap
                if kept:
                    chosen[t].append((e, True))
                else:
                    chosen[t].append((e, False))
                seen[e] += 1
            for e in range(n_experts):
                counts[e] += min(seen[e], cap - min(counts[e], cap))
        for t in range(tg):
            denom = sum(probs[t, e] for e, _ in chosen[t]) or 1.0
            y = np.zeros(h, np.float32)
            for e, kept in chosen[t]:
                if not kept:
                    continue
                up = np.asarray(jax.nn.gelu(
                    jnp.asarray(tokens[g, t] @ p["up"]["w"][e]
                                + p["up"]["b"][e]), approximate=False))
                y += (probs[t, e] / denom) * (up @ p["down"]["w"][e]
                                              + p["down"]["b"][e])
            out[g, t] = y
    down = out.reshape(b, s, h)
    x = down + np.asarray(hidden, np.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + cfg.layer_norm_eps)
    return y * p["ln"]["scale"] + p["ln"]["bias"]


@pytest.mark.parametrize("top_k,n_groups", [(1, 1), (2, 1), (2, 4)])
def test_moe_dense_matches_loop_oracle(cfg, setup, top_k, n_groups):
    params, hidden, n_experts = setup
    got, aux = moe_block(params, cfg, hidden, top_k=top_k,
                         capacity_factor=1.25, n_groups=n_groups)
    want = _loop_oracle(params, cfg, hidden, n_experts, top_k, 1.25, n_groups)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
    assert np.isfinite(float(aux["aux_loss"]))
    assert 0.0 <= float(aux["dropped_frac"]) <= 1.0


def test_moe_capacity_drop_passthrough(cfg, setup):
    """With capacity 1 slot/expert most tokens are dropped; dropped tokens
    must pass through the residual+LN unchanged (zero FFN delta)."""
    params, hidden, n_experts = setup
    tg = hidden.shape[0] * hidden.shape[1]
    tiny_cf = n_experts / (tg * 1.0)  # -> capacity exactly 1
    got, aux = moe_block(params, cfg, hidden, top_k=1,
                         capacity_factor=tiny_cf, n_groups=1)
    assert float(aux["dropped_frac"]) > 0.0
    want = _loop_oracle(params, cfg, hidden, n_experts, 1, tiny_cf, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("top_k", [1, 2])
def test_ep_matches_dense(cfg, setup, top_k):
    params, hidden, n_experts = setup
    ep = 8
    mesh = ep_mesh(ep)
    sharded = jax.device_put(params, moe_shardings(params, mesh))
    got, aux_ep = jax.jit(
        lambda p, x: expert_parallel_moe_block(
            p, cfg, x, mesh, top_k=top_k))(sharded, hidden)
    want, aux_d = moe_block(params, cfg, hidden, top_k=top_k, n_groups=ep)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
    np.testing.assert_allclose(float(aux_ep["aux_loss"]),
                               float(aux_d["aux_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(aux_ep["dropped_frac"]),
                               float(aux_d["dropped_frac"]), atol=1e-6)


def test_ep_grad_matches_dense(cfg, setup):
    """jax.grad through the all_to_all exchange == dense-path grads."""
    params, hidden, _ = setup
    ep = 8
    mesh = ep_mesh(ep)

    def loss_dense(p, x):
        out, aux = moe_block(p, cfg, x, top_k=2, n_groups=ep)
        return jnp.sum(out ** 2) + 0.01 * aux["aux_loss"]

    def loss_ep(p, x):
        out, aux = expert_parallel_moe_block(p, cfg, x, mesh, top_k=2)
        return jnp.sum(out ** 2) + 0.01 * aux["aux_loss"]

    gd = jax.grad(loss_dense)(params, hidden)
    sharded = jax.device_put(params, moe_shardings(params, mesh))
    ge = jax.jit(jax.grad(loss_ep))(sharded, hidden)
    flat_d, _ = jax.tree.flatten(gd)
    flat_e, _ = jax.tree.flatten(ge)
    for d, e in zip(flat_d, flat_e):
        np.testing.assert_allclose(np.asarray(e), np.asarray(d),
                                   atol=2e-4, rtol=1e-4)


def test_routing_positions_exact_under_bf16():
    """Slot positions must be int32-exact regardless of compute dtype: 512
    tokens all routed to one expert must land in 512 DISTINCT capacity
    slots.  (An in-dtype cumsum would collide tokens past 256 under bf16 —
    production group sizes are well beyond that.)"""
    from spmm_tpu.parallel.ep import _top_k_dispatch

    t, e = 512, 4
    probs = jnp.zeros((t, e), jnp.float32).at[:, 1].set(1.0)
    dispatch, combine, aux = _top_k_dispatch(probs, 1, t, dtype=jnp.bfloat16)
    assert dispatch.dtype == jnp.bfloat16
    per_slot = np.asarray(dispatch, np.float32).sum(axis=0)[1]
    np.testing.assert_array_equal(per_slot, np.ones(t, np.float32))
    assert float(aux["dropped_frac"]) == 0.0


def test_top_k_exceeding_experts_raises(cfg, setup):
    params, hidden, n_experts = setup
    with pytest.raises(ValueError, match="exceeds n_experts"):
        moe_block(params, cfg, hidden, top_k=n_experts + 1)


def test_ep_validates_divisibility(cfg, setup):
    params, hidden, _ = setup
    mesh = ep_mesh(8)
    with pytest.raises(ValueError, match="not divisible by ep"):
        expert_parallel_moe_block(params, cfg, hidden[:6], mesh)
    bad = init_moe_params(jax.random.PRNGKey(3), cfg, 4)
    with pytest.raises(ValueError, match="experts do not divide"):
        expert_parallel_moe_block(bad, cfg, hidden, ep_mesh(8))
