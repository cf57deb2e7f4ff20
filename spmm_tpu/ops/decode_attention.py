"""Fused beam-decode attention step as a Pallas TPU kernel.

One token step of the PV->SMILES / rxn beam decoder spends its time in the
per-layer interaction with the KV cache: appending the current position's
K/V and attending over the ancestry-masked prefix (workload reference
d_pv2smiles_batched.py:29-49; the reference re-runs the full prefix per token
on GPU — SURVEY §3.3).  The XLA formulation (inference/decoding.py
``_beam_attention``) is bandwidth-correct in principle but in practice pays

  - ~0.5-1 ms/step of dynamic_update_slice strided-write overhead for the
    deferred cache append (NOTES.md r2 profile), and
  - a superlinear blow-up on the T=102 segment (~10 ms/step at B=64 vs 2.8
    at T=62) from layout-assignment copies on the carried cache.

This kernel replaces both with explicit data movement:

  - the cache stays in HBM (``memory_space=ANY``) and is updated IN PLACE
    via ``input_output_aliases`` — the append is an aligned 8-row
    read-modify-write window, no full-buffer read-modify-write;
  - each grid cell DMAs one m-block's layer slab [MB, h, T, FD] into a
    double-buffered VMEM scratch (the next block's slab prefetches while the
    current one computes), so the per-step HBM traffic is exactly one cache
    read + one small window write;
  - **lane folding**: the k beam lanes are packed into the cache's lane
    (minor) dimension — FD = roundup128(k * head_dim), lane-block l holds
    lane l's head values.  For k=2/head_dim=64 that is exactly 128 lanes:
    the cache carries ZERO physical padding, where a [.., k, T, 64] layout
    is silently lane-padded to 128 by the (8,128) HBM tiling and every slab
    read moves 2x the useful bytes.  Scores against all lanes jointly use a
    block-diagonal query (q broadcast into its lane block, zeros elsewhere),
    so one MXU contraction over FD yields each (query-beam, lane) pair.

Numerics are identical to the XLA path: per query-beam the joint softmax
over [all lanes' prefixes ++ self] sees the same logit set, additive -10000
masking, fp32 accumulation.  Parity is asserted by
tests/test_decode_attention.py (CPU interpret mode vs the XLA path) and the
end-to-end beam-search equality test.

Mosaic survival rules baked in (discovered on-chip, see NOTES.md):
sublane (T) DMA extents multiple of 8; lane (FD) extents multiple of 128;
no minor-dim reshape splits/merges inside the kernel (all reshapes here
merge/split LEADING dims only; lane selection uses iota masks, beam-lane
iteration uses static indexing on non-minor dims).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref,            # scalar prefetch: [1] int32 position
            qf_ref,             # [MB, h, k, k, FD] block-diagonal queries
            knv_ref,            # [2, MB, h, 1, FD] folded new K and V
            vself_ref,          # [MB, h, k, FD] new V in own lane block
            sself_ref,          # [MB, h, k] fp32 unscaled self scores
            mask_ref,           # [MB, k, k, T] fp32 prefix mask (t < pos)
            cache_ref,          # [2, L, m, h, T, FD] ANY/HBM (aliased out)
            ctx_ref,            # [MB, h, k, FD] VMEM out (folded context)
            cache_out,          # aliased to cache_ref
            kbuf, vbuf,         # [2(slot), MB, h, T, FD] VMEM scratch
            wbuf,               # [2(kv), MB, h, 8, FD] append window
            slab_sems,          # DMA sems [2(slot), 2(kv)]
            append_sems,        # DMA sems [2(phase), 2(kv)]
            *, layer: int, block_m: int, scale: float, head_dim: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    pos = pos_ref[0]

    def slab_copy(block, slot, kv, buf):
        return pltpu.make_async_copy(
            cache_ref.at[kv, layer, pl.ds(block * block_m, block_m)],
            buf.at[slot],
            slab_sems.at[slot, kv],
        )

    # cold start: this cell's slab (later cells find theirs prefetched)
    @pl.when(i == 0)
    def _():
        slab_copy(0, 0, 0, kbuf).start()
        slab_copy(0, 0, 1, vbuf).start()

    # prefetch the next block's slab into the other slot
    @pl.when(i + 1 < n)
    def _():
        nxt = jax.lax.rem(i + 1, 2)
        slab_copy(i + 1, nxt, 0, kbuf).start()
        slab_copy(i + 1, nxt, 1, vbuf).start()

    slab_copy(i, slot, 0, kbuf).wait()
    slab_copy(i, slot, 1, vbuf).wait()

    # append this block's new K/V at `pos`, as an aligned 8-row
    # read-modify-write window (a 1-row DMA append is not expressible:
    # sublane extents must be 8-aligned; rows != pos are rewritten with the
    # values they already hold).  Readback overlaps the compute below.
    pa = pl.multiple_of((pos // 8) * 8, 8)
    rows = pl.ds(i * block_m, block_m)

    def window_copy(kv, phase):
        src_dst = (cache_ref.at[kv, layer, rows, :, pl.ds(pa, 8)],
                   wbuf.at[kv])
        if phase == 1:
            src_dst = (wbuf.at[kv],
                       cache_out.at[kv, layer, rows, :, pl.ds(pa, 8)])
        return pltpu.make_async_copy(*src_dst, append_sems.at[phase, kv])

    window_copy(0, 0).start()
    window_copy(1, 0).start()

    mb, h, k, _, fd = qf_ref.shape
    T = kbuf.shape[3]
    kc = kbuf[slot]                                       # [MB, h, T, FD]
    vc = vbuf[slot]
    kc_f = kc.astype(jnp.float32).reshape(mb * h, T, fd)
    # probs@V compute dtype: never fp8 (casting softmax probabilities to
    # e4m3 would destroy them); fp8 cache values upcast exactly to bf16
    cdt = jnp.bfloat16 if vc.dtype.itemsize == 1 else vc.dtype
    vc_f = vc.astype(cdt).reshape(mb * h, T, fd)
    # lane-block masks: lane c belongs to beam lane c // head_dim
    lane_of = jax.lax.broadcasted_iota(jnp.int32, (1, 1, fd), 2) // head_dim

    for q in range(k):
        qf_q = qf_ref[:, :, q].astype(jnp.float32)        # [MB, h, k, FD]
        s_q = jax.lax.dot_general(
            qf_q.reshape(mb * h, k, fd), kc_f,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(mb, h, k, T) * scale
        s_q = s_q + mask_ref[:, q][:, None]               # bcast over heads
        ss = sself_ref[:, :, q].astype(jnp.float32) * scale   # [MB, h]
        # sequential single-axis reductions: Mosaic only supports joint
        # two-trailing-dim reductions when the result keeps a size-1 lane
        mx = jnp.maximum(jnp.max(jnp.max(s_q, axis=3), axis=2), ss)
        e_q = jnp.exp(s_q - mx[:, :, None, None])
        e_s = jnp.exp(ss - mx)
        den = jnp.sum(jnp.sum(e_q, axis=3), axis=2) + e_s
        out = jax.lax.dot_general(
            e_q.reshape(mb * h, k, T).astype(cdt), vc_f,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(mb, h, k, fd)
        # keep only lane l's block from the l-th row, then sum the rows
        ctx_q = jnp.zeros((mb, h, fd), jnp.float32)
        for l in range(k):
            ctx_q = ctx_q + jnp.where(lane_of == l, out[:, :, l], 0.0)
        ctx_q = ctx_q + e_s[..., None] * vself_ref[:, :, q].astype(jnp.float32)
        ctx_q = ctx_q / den[..., None]
        ctx_ref[:, :, q] = ctx_q.astype(ctx_ref.dtype)

    # merge the new K/V into the window and write it back
    window_copy(0, 0).wait()
    window_copy(1, 0).wait()
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 8, 1), 3)
    wbuf[...] = jnp.where(row_ids == pos - pa,
                          knv_ref[...].astype(wbuf.dtype), wbuf[...])
    window_copy(0, 1).start()
    window_copy(1, 1).start()
    window_copy(0, 1).wait()
    window_copy(1, 1).wait()


def fold_dim(k: int, head_dim: int) -> int:
    """Cache lane width with the k beam lanes folded in (128-aligned)."""
    return -128 * (-(k * head_dim) // 128)


@functools.partial(
    jax.jit,
    static_argnames=("layer", "block_m", "interpret"))
def beam_decode_attention(
    q: jnp.ndarray,           # [m, h, k, D] current queries
    k_new: jnp.ndarray,       # [m, h, k, D] current K
    v_new: jnp.ndarray,       # [m, h, k, D] current V
    cache: jnp.ndarray,       # [2, L, m, h, T, FD] lane-folded beam cache
    mask: jnp.ndarray,        # [m, k, k, T] additive fp32 prefix mask (t<pos)
    pos: jnp.ndarray,         # scalar int32
    layer: int,
    block_m: int = 8,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One layer's fused cache-append + ancestry-masked beam attention.

    Returns (ctx [m, h, k, D], cache) where ``cache`` is the SAME buffer
    updated in place (input_output_aliases) with k_new/v_new written at
    ``pos`` (lane-folded).  Callers must thread the returned cache into the
    next use.
    """
    m, h, k, d = q.shape
    T, fd = cache.shape[4], cache.shape[5]
    assert fd == fold_dim(k, d), (fd, k, d)
    assert m % block_m == 0, (m, block_m)
    assert T % 8 == 0, f"cache T={T} must be 8-aligned (Mosaic DMA tiling)"
    n_blocks = m // block_m

    # XLA-side folding (all tiny): block-diagonal queries, folded new K/V,
    # own-lane-block new V, unscaled self scores
    eye = jnp.eye(k, dtype=q.dtype)
    pad = [(0, 0)] * 3 + [(0, fd - k * d)]
    qf = (q[:, :, :, None, None, :] * eye[None, None, None, :, :, None]
          ).reshape(m, h, k, k, k * d)
    qf = jnp.pad(qf, [(0, 0)] * 4 + [(0, fd - k * d)])
    knv = jnp.pad(jnp.stack([k_new.reshape(m, h, k * d),
                             v_new.reshape(m, h, k * d)]),
                  [(0, 0)] * 3 + [(0, fd - k * d)])[:, :, :, None, :]
    vself = jnp.pad(
        (v_new[:, :, :, None, :] * eye[None, None, :, :, None]
         ).reshape(m, h, k, k * d), pad)
    sself = jnp.sum(q.astype(jnp.float32) * k_new.astype(jnp.float32),
                    axis=-1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_m, h, k, k, fd),
                         lambda i, p: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_m, h, 1, fd),
                         lambda i, p: (0, i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h, k, fd), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, h, k), lambda i, p: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, k, k, T), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_m, h, k, fd), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_m, h, T, fd), cache.dtype),
            pltpu.VMEM((2, block_m, h, T, fd), cache.dtype),
            pltpu.VMEM((2, block_m, h, 8, fd), cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    slab_bytes = 2 * m * h * T * fd * cache.dtype.itemsize
    ctx_fold, cache = pl.pallas_call(
        functools.partial(_kernel, layer=layer, block_m=block_m,
                          scale=d ** -0.5, head_dim=d),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, h, k, fd), q.dtype),
            jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        ],
        # flat operands: [pos, qf, knv, vself, sself, mask, cache];
        # cache input index 6 -> output 1
        input_output_aliases={6: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * h * k * T * fd,
            bytes_accessed=slab_bytes,
            transcendentals=m * h * k * (k * T + 1),
        ),
        interpret=interpret,
    )(pos.reshape(1).astype(jnp.int32), qf, knv, vself,
      sself.astype(jnp.float32), mask, cache)
    # unfold: lane-block l of query-beam q's row is lane l's contribution
    ctx = ctx_fold[..., : k * d].reshape(m, h, k, k, d).sum(axis=3)
    return ctx, cache
