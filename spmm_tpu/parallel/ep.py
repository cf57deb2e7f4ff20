"""Expert parallelism (GShard-style MoE) over an 'ep' mesh axis.

The reference has no mixture-of-experts and no expert parallelism (its only
axis is DDP, reference SPMM_pretrain.py:35-36), and this ~110M-param dense
model family never needs one.  Like `parallel/pp.py`, this module is the
framework building block anyway, built the TPU-native way:

- a static-shape, capacity-factored top-k router (GShard dispatch/combine
  tensors — no dynamic shapes, no sorts on the hot path, everything lowers
  to one-hots, cumsums and einsums the MXU/VPU like);
- a drop-in MoE FFN block with the exact residual+LN structure of
  `models.bert.mlp_block` (reference xbert.py:425-451), so an MoE variant
  of any encoder layer is one substitution away;
- `expert_parallel_moe_block`: the same math `shard_map`-ped over a 1-D
  'ep' mesh — tokens batch-sharded, expert weights sharded one slab per
  device, and the dispatch/return hops expressed as `lax.all_to_all`
  riding ICI.  Differentiable end to end (the transpose of all_to_all is
  the reverse all_to_all), so `jax.grad` derives the backward exchange
  automatically — equivalence in values AND gradients is tested on the
  8-device virtual CPU mesh (tests/test_expert_parallel.py).

Grouping semantics (why dense == sharded *exactly*): GShard routes within
fixed token groups — capacity is enforced per group, and tokens beyond an
expert's capacity inside their group are dropped (pass through the residual
unchanged).  The dense path takes `n_groups` explicitly; the expert-parallel
path routes within each device's local batch, i.e. behaves exactly like the
dense path with `n_groups == ep`.  Tests pin that equivalence.

Router numerics: softmax over expert logits in fp32 (same fp32-softmax
convention as ops/attention.py); top-k gates renormalized over the selected
experts (GShard top-2 convention).  The standard load-balancing auxiliary
loss (n_experts * sum_e fraction_e * mean_prob_e, Switch-Transformer eq. 4)
is returned alongside the output, as is the dropped-token fraction — both
replicated across the mesh so a training loop can add them to its loss
without extra collectives.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models.bert import gelu, layer_norm

EP_AXIS = "ep"

Params = dict[str, Any]


def ep_mesh(ep: int, devices: Optional[Sequence] = None) -> Mesh:
    """1-D ('ep',) mesh over the first ``ep`` visible devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < ep:
        raise ValueError(f"need {ep} devices for ep={ep}, have {len(devices)}")
    return Mesh(np.asarray(devices[:ep]), (EP_AXIS,))


def init_moe_params(rng: jax.Array, cfg: BertArchConfig, n_experts: int,
                    std: float = 0.02) -> Params:
    """MoE FFN params: router + per-expert up/down stacks + the block LN.

    Expert weights carry a leading [E] dim (shard it over 'ep' with
    :func:`moe_shardings`); each expert's up/down matches the dense
    `mlp` init of models.bert.init_bert_params.
    """
    h, f = cfg.hidden_size, cfg.intermediate_size
    k_r, k_u, k_d = jax.random.split(rng, 3)
    return {
        "router": {"w": jax.random.normal(k_r, (h, n_experts), jnp.float32) * std},
        "up": {
            "w": jax.random.normal(k_u, (n_experts, h, f), jnp.float32) * std,
            "b": jnp.zeros((n_experts, f), jnp.float32),
        },
        "down": {
            "w": jax.random.normal(k_d, (n_experts, f, h), jnp.float32) * std,
            "b": jnp.zeros((n_experts, h), jnp.float32),
        },
        "ln": {"scale": jnp.ones((h,), jnp.float32),
               "bias": jnp.zeros((h,), jnp.float32)},
    }


def moe_shardings(params: Params, mesh: Mesh) -> Params:
    """NamedShardings for :func:`init_moe_params` output on an 'ep' mesh:
    expert slabs sharded on their leading E dim, router/LN replicated."""
    expert = NamedSharding(mesh, P(EP_AXIS))
    repl = NamedSharding(mesh, P())
    return {
        "router": {"w": repl},
        "up": {"w": expert, "b": expert},
        "down": {"w": expert, "b": expert},
        "ln": {"scale": repl, "bias": repl},
    }


def expert_capacity(tokens_per_group: int, n_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-group per-expert capacity (GShard): ceil of the even
    share of (token, choice) slots, scaled by ``capacity_factor``."""
    return max(1, int(np.ceil(
        tokens_per_group * top_k * capacity_factor / n_experts)))


def _top_k_dispatch(probs: jnp.ndarray, top_k: int, capacity: int,
                    dtype=None):
    """Build GShard dispatch/combine tensors for ONE token group.

    ``probs`` [T, E] router softmax (fp32 from :func:`_route`).  Returns
    (dispatch [T, E, C] as the 0/1 routing tensor, combine [T, E, C]
    carrying renormalized gate weights — both cast to ``dtype`` — and an
    aux dict in fp32).  Choice ranks fill expert slots in priority order
    (all 1st choices first, then 2nd, ...), each rank in token order —
    the standard mesh-tf/flaxformer position assignment.

    Slot positions are computed with int32 cumsums and gates in fp32 no
    matter the compute dtype: a bf16 cumsum stops representing integers
    exactly past 256, which would collide tokens into one capacity slot
    on production group sizes.
    """
    t, e = probs.shape
    dtype = dtype or probs.dtype
    probs = probs.astype(jnp.float32)
    p = probs
    masks, gates = [], []
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.int32)      # [T, E]
        masks.append(onehot)
        gates.append(jnp.sum(probs * onehot, axis=-1))        # raw prob
        p = p * (1.0 - onehot)
    # aux load-balance loss from pre-capacity FIRST-choice routing
    # (Switch-Transformer eq. 4): E * sum_e fraction_e * mean_prob_e
    frac = jnp.mean(masks[0].astype(jnp.float32), axis=0)
    mean_prob = jnp.mean(probs, axis=0)
    aux_loss = e * jnp.sum(frac * mean_prob)

    # positions: rank r choices claim slots after ranks < r (int32-exact)
    offset = jnp.zeros((e,), jnp.int32)
    kept_masks, positions = [], []
    n_slots = 0
    for m in masks:
        pos = jnp.cumsum(m, axis=0) - m + offset[None, :]     # [T, E] int32
        keep = m * (pos < capacity)
        kept_masks.append(keep)
        positions.append(pos)
        offset = offset + jnp.sum(keep, axis=0)   # capped count (mesh-tf)
        n_slots += jnp.sum(m)
    dropped_frac = 1.0 - sum(
        jnp.sum(k) for k in kept_masks).astype(jnp.float32) / (
        jnp.maximum(n_slots, 1).astype(jnp.float32))

    # renormalize gates over the selected (pre-capacity) experts
    denom = sum(gates)
    denom = jnp.where(denom > 0, denom, 1.0)
    combine = jnp.zeros((t, e, capacity), jnp.float32)
    dispatch = jnp.zeros((t, e, capacity), jnp.float32)
    for m, g, pos in zip(kept_masks, gates, positions):
        slot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)
        routed = m.astype(jnp.float32)[..., None] * slot      # [T, E, C]
        dispatch = dispatch + routed
        combine = combine + (g / denom)[:, None, None] * routed
    return (dispatch.astype(dtype), combine.astype(dtype),
            {"aux_loss": aux_loss, "dropped_frac": dropped_frac})


def _expert_ffn(up: Params, down: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Per-expert FFN over dispatched slots ``x`` [..., E, C, H]."""
    h = gelu(jnp.einsum("...ech,ehf->...ecf", x, up["w"]) + up["b"][:, None, :])
    return jnp.einsum("...ecf,efh->...ech", h, down["w"]) + down["b"][:, None, :]


def _route(router_w: jnp.ndarray, tokens: jnp.ndarray, top_k: int,
           capacity: int):
    """fp32-softmax routing for grouped ``tokens`` [..., T, H]."""
    n_experts = router_w.shape[1]
    if top_k > n_experts:
        raise ValueError(f"top_k={top_k} exceeds n_experts={n_experts}")
    logits = (tokens.astype(jnp.float32) @ router_w.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    build = partial(_top_k_dispatch, top_k=top_k, capacity=capacity,
                    dtype=tokens.dtype)
    for _ in range(tokens.ndim - 2):
        build = jax.vmap(build)
    return build(probs)


def moe_block(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
    n_groups: int = 1,
    deterministic: bool = True,
    rng: Optional[jax.Array] = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Dense (single-device) MoE FFN block, drop-in for bert.mlp_block.

    ``hidden`` [B, S, H]; routing happens within ``n_groups`` groups along
    batch (capacity is per group — the expert-parallel path equals this
    with ``n_groups == ep``).  Returns (block output [B, S, H], aux dict
    with 'aux_loss' and 'dropped_frac', both scalars averaged over groups).
    Dropped tokens contribute a zero FFN delta, i.e. pass through the
    residual+LN unchanged.
    """
    b, s, h = hidden.shape
    if b % n_groups:
        raise ValueError(f"batch {b} not divisible by n_groups={n_groups}")
    n_experts = p["router"]["w"].shape[1]
    tg = (b // n_groups) * s
    capacity = expert_capacity(tg, n_experts, top_k, capacity_factor)
    tokens = hidden.reshape(n_groups, tg, h)
    dispatch, combine, aux = _route(p["router"]["w"], tokens, top_k, capacity)
    slots = jnp.einsum("gtec,gth->gech", dispatch, tokens)
    slots = _expert_ffn(p["up"], p["down"], slots)
    down = jnp.einsum("gtec,gech->gth", combine, slots).reshape(b, s, h)
    aux = {k: jnp.mean(v) for k, v in aux.items()}
    return _finish_block(p, cfg, hidden, down, deterministic, rng), aux


def _finish_block(p, cfg, hidden, down, deterministic, rng):
    # same dropout+residual+LN tail as models.bert.mlp_block
    # (reference xbert.py:443-451)
    if not deterministic and cfg.hidden_dropout_prob > 0.0:
        keep = jax.random.bernoulli(
            rng, 1.0 - cfg.hidden_dropout_prob, down.shape)
        down = jnp.where(keep, down / (1.0 - cfg.hidden_dropout_prob), 0.0)
    return layer_norm(p["ln"], down + hidden, cfg.layer_norm_eps)


def expert_parallel_moe_block(
    p: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    mesh: Mesh,
    *,
    top_k: int = 2,
    capacity_factor: float = 1.25,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """MoE FFN block with experts sharded over the 'ep' mesh axis.

    Tokens are batch-sharded over 'ep'; each device routes its local group,
    dispatches slots to expert owners via ``lax.all_to_all``, runs its own
    expert slab, and receives results back through the reverse all_to_all.
    Numerically identical to ``moe_block(..., n_groups=ep)`` on the gathered
    batch (values and grads — tests/test_expert_parallel.py).  Deterministic
    only (no dropout threading; inference and deterministic-loss training).
    """
    ep = dict(mesh.shape)[EP_AXIS]
    b, s, h = hidden.shape
    if b % ep:
        raise ValueError(f"batch {b} not divisible by ep={ep}")
    n_experts = p["router"]["w"].shape[1]
    if n_experts % ep:
        raise ValueError(
            f"{n_experts} experts do not divide over ep={ep} devices")
    capacity = expert_capacity((b // ep) * s, n_experts, top_k,
                               capacity_factor)

    pspecs = moe_shardings(p, mesh)
    in_specs = (jax.tree.map(lambda sh: sh.spec, pspecs,
                             is_leaf=lambda x: isinstance(x, NamedSharding)),
                P(EP_AXIS))

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=(P(EP_AXIS), P()), check_vma=False)
    def run(p_local, hidden_local):
        bl = hidden_local.shape[0]
        tokens = hidden_local.reshape(bl * s, h)
        dispatch, combine, aux = _route(p_local["router"]["w"], tokens,
                                        top_k, capacity)
        # local slots [E, C, H] -> owner devices [E/ep, ep*C, H]
        slots = jnp.einsum("tec,th->ech", dispatch, tokens)
        slots = jax.lax.all_to_all(slots, EP_AXIS, split_axis=0,
                                   concat_axis=1, tiled=True)
        slots = _expert_ffn(p_local["up"], p_local["down"], slots)
        # back to the token owners [E, C, H]
        slots = jax.lax.all_to_all(slots, EP_AXIS, split_axis=1,
                                   concat_axis=0, tiled=True)
        down = jnp.einsum("tec,ech->th", combine, slots).reshape(bl, s, h)
        out = _finish_block(p_local, cfg, hidden_local, down, True, None)
        aux = {k: jax.lax.pmean(v, EP_AXIS) for k, v in aux.items()}
        return out, aux

    return run(p, hidden)
