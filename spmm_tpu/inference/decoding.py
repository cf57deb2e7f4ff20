"""KV-cached autoregressive decoding + reference-exact k-beam search.

The reference decodes by re-running the full 12-layer stack over the whole
prefix for every token with host-side beam bookkeeping (numpy unravel_index,
python harvest lists; reference d_pv2smiles_single.py:26-51,79-110 — its KV
cache plumbing exists in xbert but is never used).  This module is the
TPU-native replacement:

  - a preallocated, fixed-size self-attention KV cache written with
    ``lax.dynamic_update_slice`` (one decoder forward per token over a length-1
    query);
  - cross-attention K/V over the fixed encoder sequence computed ONCE per
    decode and reused every step;
  - beam bookkeeping fully on-device inside ``lax.while_loop`` segments (no
    host syncs until the final result), natively batched over molecules with
    an append-only cache + ancestry indirection (see beam_search_batched).

Beam semantics replicate the reference exactly (d_pv2smiles_single.py:79-110,
d_rxn_prediction.py:85-123):
  - step 0 seeds k beams from the [CLS] distribution (no SEP harvesting);
  - every later step expands k beams x k candidates, harvests every candidate
    whose new token is [SEP] with its pre-suppression logprob, then suppresses
    it to -1e5 before the top-k over the flattened k*k scores;
  - stops when >= ``stop_count`` beams have been harvested (k**2 for the
    single-query workload, k for the batched one — d_pv2smiles_batched.py:45)
    or after ``max_steps`` (100) token steps;
  - stochastic mode draws k samples without replacement (Gumbel top-k, the
    exact distribution of torch.multinomial(replacement=False)) and scores
    them by log softmax probability; deterministic mode takes top-k.

Divergence from the reference (documented): if NO beam finished within
max_steps the reference would crash on an empty candidate list; we fall back
to the live beams.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models import bert as jbert
from spmm_tpu.ops.masks import MASK_VALUE

Params = dict[str, Any]


# --------------------------------------------------------------------------- #
# KV cache
# --------------------------------------------------------------------------- #


def init_self_cache(
    cfg: BertArchConfig, batch: int, max_len: int, dtype=jnp.float32
) -> Params:
    # layer-major layout [L, B, h, T, D]: per-layer slices are contiguous
    # (the attention working set each step), and the cache is append-only —
    # beam search never physically reorders it (ancestry indirection resolves
    # the beam shuffle at attention time, see _beam_attention)
    shape = (cfg.num_hidden_layers, batch, cfg.num_attention_heads,
             max_len, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def init_beam_cache_kv(
    cfg: BertArchConfig, m: int, k: int, max_len: int, dtype=jnp.float32
) -> jnp.ndarray:
    """Beam-search KV cache as ONE array [2(kv), L, m, h, k, T, D].

    One array so the deferred per-step append is a single
    dynamic_update_slice (each DUS carries ~0.5 ms of strided-write overhead
    at these shapes regardless of slab size).  Heads precede lanes so each
    layer's slice feeds _beam_attention directly (batch dims m,h
    adjacent-leading, contraction over (lane, position) — no transposes, no
    retiling reshapes), with beam ancestry folded into the additive mask
    (see _ancestry_mask).  The cache is append-only: beam search never
    physically reorders it — the old per-token full-cache gather (read+write
    of the whole buffer at ~30 GB/s effective gather speed on v5e) is
    replaced by a cheap [m, k, T] int32 ancestry permutation.
    """
    shape = (2, cfg.num_hidden_layers, m, cfg.num_attention_heads, k,
             max_len, cfg.head_dim)
    return jnp.zeros(shape, dtype)


def _pin_cache_layout(cache: Params) -> Params:
    """Pin the beam cache to row-major layout (head_dim minor).

    XLA's layout assignment flips larger-T carried caches to a T-minor tiled
    layout (preferring the joint (l, t)-contracting attention einsum), which
    turns every position write into a full-buffer read-modify-write —
    profiled at 2.6 ms per dynamic_update_slice at T=102 (the whole 240MB
    buffer) vs ~0.05 ms with the natural d-minor layout."""
    try:
        from jax.experimental.layout import Layout, with_layout_constraint
    except ImportError:            # older jax: no pinning, still correct
        return cache
    return jax.tree.map(
        lambda c: with_layout_constraint(
            c, Layout(major_to_minor=tuple(range(c.ndim)))), cache)


def _ancestry_mask(anc: jnp.ndarray, key_valid: jnp.ndarray) -> jnp.ndarray:
    """Additive mask [m, 1, k(beam), k(lane), T] selecting ancestor lanes.

    Entry (m, b, l, t) is 0 where ``anc[m, b, t] == l`` and position t is
    valid for beam b, else MASK_VALUE (-10000, the reference's additive-mask
    convention).  Masked-out entries underflow to exactly 0.0 in the fp32
    softmax, so attending over all k*T (lane, position) keys with this mask
    is bit-identical to attending over beam b's own T-entry virtual cache.
    """
    m, k, T = anc.shape
    onehot = anc[:, :, None, :] == jnp.arange(k, dtype=anc.dtype)[None, None, :, None]
    sel = jnp.logical_and(onehot, key_valid[:, :, None, :].astype(bool))
    return ((1.0 - sel.astype(jnp.float32)) * MASK_VALUE)[:, None]


def _beam_attention(
    q: jnp.ndarray,       # [m, h, k, D] one query per beam (query-length = k)
    k6: jnp.ndarray,      # [m, h, k, T, D] cache WITHOUT the current position
    v6: jnp.ndarray,      # [m, h, k, T, D]
    mask: jnp.ndarray,    # [m, 1, k, k, T] prefix mask (t < pos only)
    k_self: jnp.ndarray,  # [m, h, k, D] current token's K (own lane)
    v_self: jnp.ndarray,  # [m, h, k, D]
) -> jnp.ndarray:
    """Attention over the cached prefix plus the current token's own K/V.

    The self term is computed densely from k_self/v_self (a beam can only
    attend to its OWN lane at the newest position), so the cache write for
    the current position can be deferred and batched across layers — 2
    dynamic_update_slices per token step instead of 24 (each DUS costs
    ~50 us of strided-write overhead on v5e regardless of slab size).

    The prefix contracts (l, t) jointly WITHOUT merging them in the cache
    layout — a [.., k, T, D] -> [.., k*T, D] reshape retiles the whole
    carried buffer every step when T is not tile-aligned (measured 126
    ms/step at m=64 vs ~3 ms/step for this formulation).  fp32
    scores/softmax; the joint softmax over [prefix ++ self] sees exactly
    the same logit set as attention over a per-beam cache that included the
    current position, so numerics are unchanged (masked-out terms are
    exactly 0.0).
    """
    d = q.shape[-1]
    scale = jnp.asarray(d, jnp.float32) ** -0.5
    s = jnp.einsum("mhqd,mhltd->mhqlt", q, k6,
                   preferred_element_type=jnp.float32)
    s = s * scale + mask
    s_self = jnp.sum(q.astype(jnp.float32) * k_self.astype(jnp.float32),
                     axis=-1) * scale                     # [m, h, k]
    m_, h_, kq = s_self.shape
    s_all = jnp.concatenate(
        [s.reshape(m_, h_, kq, -1), s_self[..., None]], axis=-1)
    mx = s_all.max(axis=-1, keepdims=True)
    e = jnp.exp(s_all - mx)
    p = e / e.sum(axis=-1, keepdims=True)
    p_pre = p[..., :-1].reshape(s.shape).astype(v6.dtype)
    p_self = p[..., -1].astype(v_self.dtype)
    # contract t ONLY, with l as a batch dim, then reduce over l: a joint
    # (l, t) contraction makes XLA prefer a t-minor layout for the carried
    # cache (position writes become full-buffer RMW) or, once the layout is
    # pinned d-minor, insert a 20MB layout-conversion copy per layer per
    # step; batching l keeps the rhs in the exact greedy-attention form
    ctx = jnp.einsum("mhqlt,mhltd->mhlqd", p_pre, v6).sum(axis=2)
    return ctx + p_self[..., None] * v_self


def _pallas_beam_attention(q_m, k_m, v_m, cache, self_mask, pos, layer):
    """Call the fused Pallas kernel (ops/decode_attention.py) for one layer.

    Interpret mode off-TPU keeps the single code path testable on the CPU
    mesh; block_m is the largest power-of-two divisor of m whose four slab
    buffers (K/V x double-buffer) fit a ~64MB VMEM budget.  Measured on
    v5e: block size is perf-neutral at k=2 (the kernel is slab-DMA
    bandwidth-bound — profiled 1.42 ms/step at m=128/T<=104 vs the ~0.84 ms
    pure-traffic floor, ~60% effective HBM BW either way); larger blocks
    are kept for the fewer grid cells and append-window RMWs."""
    from spmm_tpu.ops.decode_attention import beam_decode_attention

    m = q_m.shape[0]
    _, _, _, h, T, fd = cache.shape
    slab_bytes_per_row = h * T * fd * cache.dtype.itemsize
    budget = 64 * 1024 * 1024
    block_m = next(b for b in (32, 16, 8, 4, 2, 1)
                   if m % b == 0 and 4 * b * slab_bytes_per_row <= budget)
    interpret = jax.default_backend() != "tpu"
    # fp8 cache: q/k/v enter in bf16 (the kernel quantizes only the
    # appended K/V row; scores/probs never round-trip through e4m3)
    cdt = jnp.bfloat16 if cache.dtype.itemsize == 1 else cache.dtype
    return beam_decode_attention(
        q_m.astype(cdt), k_m.astype(cdt), v_m.astype(cdt), cache,
        self_mask[:, 0].astype(jnp.float32), pos, layer=layer,
        block_m=block_m, interpret=interpret)


def precompute_cross_kv(
    params_mlm: Params,
    cfg: BertArchConfig,
    encoder_hidden: jnp.ndarray,  # [B, Le, H]
) -> Params:
    """Cross-attention K/V for every fusion layer, computed once per decode."""
    layers = params_mlm["bert"]["layers"]
    ks, vs = [], []
    for i in range(cfg.num_hidden_layers):
        lp = layers[i]
        if "cross_attn" in lp:
            k = jbert.split_heads(jbert.dense(lp["cross_attn"]["k"], encoder_hidden),
                                  cfg.num_attention_heads)
            v = jbert.split_heads(jbert.dense(lp["cross_attn"]["v"], encoder_hidden),
                                  cfg.num_attention_heads)
        else:
            b, le = encoder_hidden.shape[:2]
            k = jnp.zeros((b, cfg.num_attention_heads, le, cfg.head_dim),
                          encoder_hidden.dtype)
            v = k
        ks.append(k)
        vs.append(v)
    return {"k": jnp.stack(ks), "v": jnp.stack(vs)}


def decode_step(
    params_mlm: Params,
    cfg: BertArchConfig,
    token: jnp.ndarray,          # [B] current token ids
    pos: jnp.ndarray,            # scalar int32: position of `token`
    cache: Params,               # self KV cache [L, B, h, T, D]
    key_valid: jnp.ndarray,      # [B, T] 1 = attend (written non-pad tokens)
    cross_kv: Optional[Params],  # from precompute_cross_kv (or None)
    cross_mask: Optional[jnp.ndarray],  # [B or m, Le] binary (or None)
    anc: Optional[jnp.ndarray] = None,  # [m, k, T] beam ancestry (or None)
    pallas: bool = False,        # fused cache-append+attention kernel (beam)
) -> tuple[jnp.ndarray, Params]:
    """One cached decoder step; returns (logits [B, V], updated cache).

    Mathematically identical to the reference's full-prefix re-forward at the
    last position: under causal masking earlier hidden states never change, so
    caching their K/V is exact.

    Two batch layouts:
      - greedy (``anc=None``): B independent rows; cache [L, B, h, T, D],
        cross_kv/cross_mask per row.
      - beam (``anc`` given, shape [m, k, T]): B = m*k lanes (beam-major
        within molecule); cache [2, L, m, h, k, T, D] (init_beam_cache_kv) whose k
        lanes act as extra key positions with the beam-ancestry indirection
        folded into the additive mask (_ancestry_mask); cross_kv/cross_mask
        are per *molecule* [L, m, h, Le, D] / [m, Le] — the k beams of a
        molecule attend to the shared encoder K/V as k query positions of one
        attention call, so the encoder cache is never duplicated per beam.
    """
    h = cfg.num_attention_heads
    hidden = jbert.embeddings_forward(
        params_mlm["bert"]["embeddings"], cfg,
        input_ids=token[:, None], position_offset=pos,
    )  # [B, 1, H]
    xmask = None
    if cross_mask is not None:
        xmask = ((1.0 - cross_mask.astype(jnp.float32)) * MASK_VALUE)[:, None, None, :]
    if anc is not None:
        m, kb, T = anc.shape
        # the cache write for `pos` is deferred to one batched DUS below, so
        # the prefix mask must exclude t >= pos (the current token's own
        # K/V enter _beam_attention as a dense self term instead)
        prefix_valid = key_valid.reshape(m, kb, T) * (
            jnp.arange(T)[None, None, :] < pos)
        self_mask = _ancestry_mask(anc, prefix_valid)
        k_slabs, v_slabs = [], []
    else:
        self_mask = ((1.0 - key_valid.astype(jnp.float32))
                     * MASK_VALUE)[:, None, None, :]

    if anc is not None:
        new_cache_kv = cache                  # [2, L, m, h, k, T, D] array
        new_cache_k = new_cache_v = None
    else:
        new_cache_k, new_cache_v = cache["k"], cache["v"]
    for i in range(cfg.num_hidden_layers):
        lp = params_mlm["bert"]["layers"][i]
        sp = lp["self_attn"]
        q = jbert.split_heads(jbert.dense(sp["q"], hidden), h)
        k_new = jbert.split_heads(jbert.dense(sp["k"], hidden), h)  # [B,h,1,D]
        v_new = jbert.split_heads(jbert.dense(sp["v"], hidden), h)
        if anc is not None:
            d = q.shape[-1]
            k_m = k_new.reshape(m, kb, h, d).transpose(0, 2, 1, 3)
            v_m = v_new.reshape(m, kb, h, d).transpose(0, 2, 1, 3)
            q_m = q.reshape(m, kb, h, d).transpose(0, 2, 1, 3)  # [m, h, k, D]
            if pallas:
                # fused kernel: appends k_m/v_m at pos IN PLACE (aliased
                # cache) and attends over the ancestry-masked prefix — no
                # dynamic_update_slice, no full-cache layout copies
                ctx, new_cache_kv = _pallas_beam_attention(
                    q_m, k_m, v_m, new_cache_kv, self_mask, pos, i)
            else:
                k_slabs.append(k_m)
                v_slabs.append(v_m)
                ctx = _beam_attention(
                    q_m, new_cache_kv[0, i].astype(q.dtype),
                    new_cache_kv[1, i].astype(q.dtype), self_mask,
                    k_m, v_m)                                   # [m, h, k, D]
            ctx = ctx.transpose(0, 2, 1, 3).reshape(m * kb, h, 1, d)
        else:
            new_cache_k = jax.lax.dynamic_update_slice(
                new_cache_k, k_new[None].astype(new_cache_k.dtype),
                (i, 0, 0, pos, 0))
            new_cache_v = jax.lax.dynamic_update_slice(
                new_cache_v, v_new[None].astype(new_cache_v.dtype),
                (i, 0, 0, pos, 0))
            ctx = jbert.multi_head_attention(
                q, new_cache_k[i].astype(q.dtype),
                new_cache_v[i].astype(q.dtype), self_mask)
        att = jbert.dense(sp["out"], jbert.merge_heads(ctx))
        hidden = jbert.layer_norm(sp["ln"], att + hidden, cfg.layer_norm_eps)
        if "cross_attn" in lp:
            cp = lp["cross_attn"]
            qx = jbert.split_heads(jbert.dense(cp["q"], hidden), h)
            if anc is not None:
                # fold the k beams into the query length of one attention
                # call over the molecule's shared encoder K/V
                d = qx.shape[-1]
                qx_m = qx.reshape(m, kb, h, d).transpose(0, 2, 1, 3)
                ctxx = jbert.multi_head_attention(
                    qx_m, cross_kv["k"][i].astype(qx.dtype),
                    cross_kv["v"][i].astype(qx.dtype), xmask)  # [m, h, kb, d]
                ctxx = ctxx.transpose(0, 2, 1, 3).reshape(m * kb, h, 1, d)
            else:
                ctxx = jbert.multi_head_attention(
                    qx, cross_kv["k"][i].astype(qx.dtype),
                    cross_kv["v"][i].astype(qx.dtype), xmask)
            attx = jbert.dense(cp["out"], jbert.merge_heads(ctxx))
            hidden = jbert.layer_norm(cp["ln"], attx + hidden, cfg.layer_norm_eps)
        hidden = jbert.mlp_block(lp["mlp"], cfg, hidden)

    logits = jbert.mlm_head_forward(params_mlm["mlm_head"], cfg, hidden,
                                    params_mlm["bert"]["embeddings"]["word"])
    if anc is not None:
        if pallas:
            cache = new_cache_kv          # appended in place by the kernel
        else:
            # ONE batched write for all layers' K and V at pos
            kv_stack = jnp.stack(
                [jnp.stack(k_slabs), jnp.stack(v_slabs)]
            )[:, :, :, :, :, None, :]         # [2, L, m, h, k, 1, D]
            cache = jax.lax.dynamic_update_slice(
                new_cache_kv, kv_stack.astype(new_cache_kv.dtype),
                (0, 0, 0, 0, 0, pos, 0))
    else:
        cache = {"k": new_cache_k, "v": new_cache_v}
    return logits[:, 0, :], cache


# --------------------------------------------------------------------------- #
# k-beam search (single sequence; vmap over molecules/queries)
# --------------------------------------------------------------------------- #


@dataclasses.dataclass(frozen=True)
class BeamSpec:
    k: int = 2
    stop_count: int = 4          # k**2 single-query; k batched
    max_steps: int = 100
    stochastic: bool = False
    cls_id: int = 2
    sep_id: int = 3
    vocab_size: int = 300
    # "auto": fused Pallas decode-step kernel on TPU, XLA elsewhere;
    # "xla"/"pallas" force a path (parity tests pin "xla")
    attention: str = "auto"

    @property
    def max_len(self) -> int:
        # [CLS] + seed token + max_steps appended tokens, rounded up to a
        # multiple of 8: Mosaic requires DMA slice extents along the cache's
        # sublane (T) dimension to be 8-aligned, and the padded tail is
        # masked out everywhere (key_valid is position-driven)
        return -8 * (-(self.max_steps + 2) // 8)


def _sample_topk(logits, k, stochastic, rng):
    """(values=log softmax p of selected, indices [k]); stochastic = Gumbel
    top-k == torch.multinomial without replacement + log(p[selected])
    (reference d_pv2smiles_single.py:37-44)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    if stochastic:
        g = -jnp.log(-jnp.log(
            jax.random.uniform(rng, logp.shape, minval=1e-20, maxval=1.0)))
        _, idx = jax.lax.top_k(logp + g, k)
        vals = jnp.take_along_axis(logp, idx, axis=-1)
    else:
        vals, idx = jax.lax.top_k(logp, k)
    return vals, idx


def _sample_topk_batch(logits, k, stochastic, rngs):
    """Per-molecule _sample_topk: logits [m, ...], rngs [m] keys."""
    return jax.vmap(lambda lg, r: _sample_topk(lg, k, stochastic, r))(
        logits, rngs)


def beam_search_batched(
    params_mlm: Params,
    cfg: BertArchConfig,
    cross_hidden: jnp.ndarray,      # [m, Le, H] encoder sequence per query
    cross_mask: jnp.ndarray,        # [m, Le] binary
    spec: BeamSpec,
    rngs: Optional[jax.Array] = None,   # [m] PRNG keys
    cache_dtype=jnp.float32,
) -> dict[str, jnp.ndarray]:
    """Reference-exact k-beam decode over a batch of m queries.

    The molecule batch is handled natively (not via vmap): the while-loop
    condition is the scalar "any molecule unfinished", so JAX never has to
    rewrite the body with a per-lane select over the whole carry — the KV
    cache is written append-only and read once per step, nothing else.  Per-
    molecule completion freezes only the cheap outputs (seqs/logp/harvest
    buffers); random streams are per molecule and identical to running each
    query alone (fold_in(rng_m, step)).

    Returns dict with leading molecule axis m:
      seqs     [m, k, max_len]  top-k finished sequences (incl. trailing SEP)
      logp     [m, k]           their logprobs
      lengths  [m, k]           sequence lengths incl. the trailing SEP
      n_finished [m]            harvested-beam count (0 => live-beam fallback)
    """
    m = cross_hidden.shape[0]
    k, T = spec.k, spec.max_len
    if rngs is None:
        rngs = jax.random.split(jax.random.PRNGKey(0), m)
    use_pallas = spec.attention == "pallas" or (
        spec.attention == "auto" and jax.default_backend() == "tpu")

    # segmented cache growth: run the token loop in segments with a cache
    # sized for that segment only (T_seg = seg_end + 2), padding the cache at
    # each boundary.  Every step's attention reads the full static cache, so
    # early steps at T=102 would read 3x the live data; with segments the
    # read grows with the prefix, and workloads whose beams finish early
    # (stop_count=k**2 typically lands <= 40 tokens) never touch the
    # largest cache at all — the next segment's while-loop exits immediately
    # once every molecule is done.
    seg_ends, s = [], 32
    while s < spec.max_steps:
        seg_ends.append(s)
        s *= 2
    seg_ends.append(spec.max_steps)

    def seg_len(seg_end: int) -> int:       # 8-aligned cache length (max_len)
        return min(-8 * (-(seg_end + 2) // 8), T)

    cross_kv = precompute_cross_kv(params_mlm, cfg, cross_hidden)
    if use_pallas:
        # lane-folded cache [2, L, m, h, T, k*D(->128)]: the k beam lanes
        # live in the lane (minor) dim, so the (8,128) HBM tiling carries no
        # physical padding (a [.., k, T, 64] layout is silently lane-padded
        # to 128 and every read moves 2x the useful bytes) — see
        # ops/decode_attention.py
        from spmm_tpu.ops.decode_attention import fold_dim

        cache = _pin_cache_layout(jnp.zeros(
            (2, cfg.num_hidden_layers, m, cfg.num_attention_heads,
             seg_len(seg_ends[0]), fold_dim(k, cfg.head_dim)), cache_dtype))
    else:
        cache = _pin_cache_layout(
            init_beam_cache_kv(cfg, m, k, seg_len(seg_ends[0]), cache_dtype))

    # ancestry matrix: anc[m, b, t] = physical cache lane holding beam b's
    # K/V for position t.  The cache itself is append-only (each step writes
    # lane b at the current position); the beam shuffle only permutes this
    # cheap [m, k, T] int32 matrix, and attention resolves it densely
    # (_beam_attention) — no full-cache gather per token.
    lane_ids = jnp.arange(k, dtype=jnp.int32)
    anc = jnp.broadcast_to(lane_ids[None, :, None], (m, k, T))

    # ---- step 0: [CLS] on every beam, sample k continuations ----
    T0 = seg_len(seg_ends[0])
    seqs = jnp.zeros((m, k, T), jnp.int32).at[:, :, 0].set(spec.cls_id)
    key_valid = (seqs != 0)[:, :, :T0].reshape(m * k, T0).astype(jnp.int32)
    logits, cache = decode_step(
        params_mlm, cfg, seqs.reshape(m * k, T)[:, 0], jnp.int32(0), cache,
        key_valid, cross_kv, cross_mask, anc=anc[:, :, :T0],
        pallas=use_pallas)
    step_rngs = jax.vmap(lambda r: jax.random.fold_in(r, 0))(rngs)
    vals, idx = _sample_topk_batch(
        logits.reshape(m, k, -1)[:, 0], k, spec.stochastic, step_rngs)
    seqs = seqs.at[:, :, 1].set(idx)      # beams share the CLS-cache entries
    logp = vals                            # [m, k]
    # NOTE: step-0 SEPs are not harvested (reference seeds beams unchecked)

    # running top-k harvest buffer: only the k best finished beams are ever
    # reported (reference sorted(...)[: k]), so instead of scattering every
    # SEP-ended candidate into a stop_count-sized buffer we merge each step's
    # <= k*k candidates into a k-wide running top-k (concat + top_k — no
    # scatters in the hot loop).  top_k keeps the first occurrence on ties
    # and the running buffer is concatenated before the new candidates, so
    # earlier harvests win ties exactly like the reference's stable sort.
    fin_seqs = jnp.zeros((m, k, T), jnp.int32)
    fin_logp = jnp.full((m, k), -jnp.inf, jnp.float32)
    fin_len = jnp.zeros((m, k), jnp.int32)
    fin_cnt = jnp.zeros((m,), jnp.int32)
    done = jnp.zeros((m,), bool)

    def make_segment(seg_end: int, T_seg: int):
        def cond(state):
            step, done = state[0], state[1]
            return jnp.logical_and(step < seg_end,
                                   jnp.logical_not(jnp.all(done)))

        def body(state):
            (step, done, seqs, logp, anc, cache,
             fin_seqs, fin_logp, fin_len, fin_cnt) = state
            pos = step + 1                  # position of the newest token
            key_valid = (seqs != 0)[:, :, :T_seg].reshape(
                m * k, T_seg).astype(jnp.int32)
            logits, new_cache = decode_step(
                params_mlm, cfg, seqs.reshape(m * k, T)[:, pos], pos, cache,
                key_valid, cross_kv, cross_mask, anc=anc[:, :, :T_seg],
                pallas=use_pallas)
            step_rngs = jax.vmap(
                lambda r: jax.random.fold_in(r, step + 1))(rngs)
            vals, idx = _sample_topk_batch(
                logits.reshape(m, k, -1), k, spec.stochastic, step_rngs)
            k2_p = logp[:, :, None] + vals               # [m, k, k]

            # candidate sequences: parent prefix + new token at pos+1
            cand_seqs = jnp.repeat(seqs, k, axis=1)      # [m, k*k, T]
            cand_seqs = cand_seqs.at[:, :, pos + 1].set(idx.reshape(m, k * k))

            # ---- harvest SEP-ended candidates into the running top-k ----
            ended = (idx == spec.sep_id).reshape(m, k * k)
            flat_p = k2_p.reshape(m, k * k)
            merged_logp = jnp.concatenate(
                [fin_logp, jnp.where(ended, flat_p, -jnp.inf)], axis=1)
            merged_seqs = jnp.concatenate([fin_seqs, cand_seqs], axis=1)
            merged_len = jnp.concatenate(
                [fin_len, jnp.full((m, k * k), pos + 2, jnp.int32)], axis=1)
            new_fin_logp, top = jax.lax.top_k(merged_logp, k)
            new_fin_seqs = jnp.take_along_axis(
                merged_seqs, top[:, :, None], axis=1)
            new_fin_len = jnp.take_along_axis(merged_len, top, axis=1)
            new_fin_cnt = fin_cnt + jnp.sum(ended, axis=1)

            # suppress harvested entries, then select next beams
            k2_sup = jnp.where(ended.reshape(m, k, k), -1e5, k2_p)
            new_logp, flat_idx = jax.lax.top_k(k2_sup.reshape(m, k * k), k)
            parent = flat_idx // k                       # [m, k]
            new_seqs = jnp.take_along_axis(
                cand_seqs, flat_idx[:, :, None], axis=1)
            # inherit the parent's ancestry for written positions
            # (anc[p, pos]==p since this step wrote lane p at pos); future
            # positions write into the beam's own lane
            new_anc = jnp.where(jnp.arange(T)[None, None, :] > pos,
                                lane_ids[None, :, None],
                                jnp.take_along_axis(anc, parent[:, :, None],
                                                    axis=1))

            # freeze the *outputs* of finished molecules; the cache and
            # ancestry keep advancing harmlessly — frozen outputs never read
            # them, and skipping their freeze avoids a full-cache select
            def keep(new, old):
                d = done.reshape((m,) + (1,) * (new.ndim - 1))
                return jnp.where(d, old, new)

            return (step + 1,
                    jnp.logical_or(done, new_fin_cnt >= spec.stop_count),
                    keep(new_seqs, seqs), keep(new_logp, logp),
                    new_anc, _pin_cache_layout(new_cache),
                    keep(new_fin_seqs, fin_seqs),
                    keep(new_fin_logp, fin_logp),
                    keep(new_fin_len, fin_len), keep(new_fin_cnt, fin_cnt))

        return cond, body

    state = (jnp.int32(0), done, seqs, logp, anc, cache,
             fin_seqs, fin_logp, fin_len, fin_cnt)
    prev_T = seg_len(seg_ends[0])
    for seg_end in seg_ends:
        T_seg = seg_len(seg_end)
        if T_seg != prev_T:                 # grow the cache for this segment
            cache = state[5]
            # T axis: 4 in the lane-folded pallas layout, 5 in the XLA one
            padspec = [(0, 0)] * cache.ndim
            padspec[cache.ndim - 2] = (0, T_seg - prev_T)
            cache = _pin_cache_layout(jnp.pad(cache, padspec))
            state = state[:5] + (cache,) + state[6:]
            prev_T = T_seg
        cond, body = make_segment(seg_end, T_seg)
        state = jax.lax.while_loop(cond, body, state)
    (step, done, seqs, logp, anc, cache,
     fin_seqs, fin_logp, fin_len, fin_cnt) = state

    # fallback: nothing harvested within max_steps -> use live beams (a
    # molecule with fin_cnt==0 necessarily ran the loop to max_steps);
    # fin_* are already the top-k sorted by logprob (running merge)
    no_fin = (fin_cnt == 0)[:, None]
    live_len = jnp.full((m, k), step + 2, jnp.int32)
    out_seqs = jnp.where(no_fin[:, :, None], seqs, fin_seqs)
    out_logp = jnp.where(no_fin, logp, fin_logp)
    out_len = jnp.where(no_fin, live_len, fin_len)
    return {
        "seqs": out_seqs,
        "logp": out_logp,
        "lengths": out_len,
        "n_finished": fin_cnt,
    }


def beam_search(
    params_mlm: Params,
    cfg: BertArchConfig,
    cross_hidden: jnp.ndarray,      # [Le, H] encoder sequence for this query
    cross_mask: jnp.ndarray,        # [Le] binary
    spec: BeamSpec,
    rng: Optional[jax.Array] = None,
    cache_dtype=jnp.float32,
) -> dict[str, jnp.ndarray]:
    """Single-query k-beam decode (beam_search_batched with m=1).

    Returns dict with:
      seqs     [k, max_len]  top-k finished sequences (incl. trailing SEP)
      logp     [k]           their logprobs
      lengths  [k]           sequence lengths incl. the trailing SEP
      n_finished scalar      harvested-beam count (0 => live-beam fallback)
    """
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    out = beam_search_batched(
        params_mlm, cfg, cross_hidden[None], cross_mask[None], spec,
        rng[None], cache_dtype)
    return jax.tree.map(lambda x: x[0], out)


def greedy_decode(
    params_mlm: Params,
    cfg: BertArchConfig,
    cross_hidden: jnp.ndarray,   # [B, Le, H]
    cross_mask: jnp.ndarray,     # [B, Le]
    max_steps: int = 100,
    stochastic: bool = False,
    rng: Optional[jax.Array] = None,
    cls_id: int = 2,
    sep_id: int = 3,
    cache_dtype=jnp.float32,
    attention: str = "auto",
) -> dict[str, jnp.ndarray]:
    """Batch greedy/stochastic decode (reference d_rxn_prediction.py:55-81):
    every row decodes until it has emitted [SEP] (or max_steps); a row's
    tokens keep appending after its SEP exactly like the reference (the stop
    test happens before appending).

    On TPU the step runs through the fused Pallas kernel as a k=1 beam
    (trivial ancestry) — same DUS/layout wins as the beam path."""
    b = cross_hidden.shape[0]
    use_pallas = attention == "pallas" or (
        attention == "auto" and jax.default_backend() == "tpu")
    # 8-aligned buffer for the kernel's DMA tiling; the tail is masked
    T = -8 * (-(max_steps + 2) // 8) if use_pallas else max_steps + 2
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    cross_kv = precompute_cross_kv(params_mlm, cfg, cross_hidden)
    if use_pallas:
        from spmm_tpu.ops.decode_attention import fold_dim

        cache = _pin_cache_layout(jnp.zeros(
            (2, cfg.num_hidden_layers, b, cfg.num_attention_heads, T,
             fold_dim(1, cfg.head_dim)), cache_dtype))
        anc = jnp.zeros((b, 1, T), jnp.int32)      # single lane
    else:
        cache = init_self_cache(cfg, b, T, cache_dtype)
        anc = None
    seqs = jnp.zeros((b, T), jnp.int32).at[:, 0].set(cls_id)

    def cond(state):
        step, ended_all, *_ = state
        return jnp.logical_and(step < max_steps, jnp.logical_not(ended_all))

    def body(state):
        step, _, seqs, cache = state
        key_valid = (seqs != 0).astype(jnp.int32)
        logits, cache = decode_step(
            params_mlm, cfg, seqs[:, step], step, cache, key_valid,
            cross_kv, cross_mask, anc=anc, pallas=use_pallas)
        if stochastic:
            tok = jax.random.categorical(jax.random.fold_in(rng, step), logits)
        else:
            tok = jnp.argmax(logits, axis=-1)
        seqs = seqs.at[:, step + 1].set(tok)
        # reference stops when every row has emitted SEP at least once
        # (unwritten buffer slots are 0, so scanning the whole buffer is safe)
        emitted = jnp.any(seqs == sep_id, axis=1)
        return step + 1, jnp.all(emitted), seqs, cache

    state = (jnp.int32(0), jnp.bool_(False), seqs, cache)
    step, _, seqs, _ = jax.lax.while_loop(cond, body, state)
    return {"seqs": seqs, "steps": step}
