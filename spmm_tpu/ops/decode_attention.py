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
    via ``input_output_aliases`` — the append is a single small DMA per
    (k, v), no full-buffer read-modify-write;
  - each grid cell DMAs one m-block's layer slab [MB, h, k, T, D] into a
    double-buffered VMEM scratch (the next block's slab prefetches while the
    current one computes), so the per-step HBM traffic is exactly one cache
    read + one position write;
  - scores/softmax in fp32 with the prefix mask excluding the current
    position; the current token's own K/V enter densely (same joint-softmax
    trick as ``_beam_attention``), so reading the slab concurrently with the
    position-``pos`` append is race-free: the raced bytes are masked out.

Numerics are identical to the XLA path: the joint softmax over
[prefix ++ self] sees the same logit set, additive -10000 masking, fp32
accumulation.  Parity is asserted by tests/test_decode_attention.py (CPU
interpret mode vs the XLA path) and the existing beam-parity suite.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pos_ref,            # scalar prefetch: [1] int32 position
            q_ref,              # [MB, h, k, D] VMEM
            knv_ref,            # [2, MB, h, k, 1, D] VMEM (new K and V)
            mask_ref,           # [MB, k, k, T] fp32 VMEM (prefix mask, t<pos)
            cache_ref,          # [2, L, m, h, k, T, D] ANY/HBM (aliased out)
            ctx_ref,            # [MB, h, k, D] VMEM out
            cache_out,          # aliased to cache_ref
            kbuf, vbuf,         # [2(slot), MB, h, k, T, D] VMEM scratch
            wbuf,               # [2(kv), MB, h, k, 8, D] append window
            slab_sems,          # DMA sems [2(slot), 2(kv)]
            append_sems,        # DMA sems [2(phase), 2(kv)]
            *, layer: int, block_m: int, scale: float):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    slot = jax.lax.rem(i, 2)
    pos = pos_ref[0]

    def slab_copy(block, slot, kv, buf):
        return pltpu.make_async_copy(
            cache_ref.at[kv, layer,
                         pl.ds(block * block_m, block_m)],
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
    # read-modify-write window (Mosaic requires DMA slice extents on the
    # sublane (T) dim to be 8-aligned, so a 1-row append is not expressible;
    # rows != pos are rewritten with the values they already hold).  The
    # readback starts now and overlaps the attention compute below.
    pa = pl.multiple_of((pos // 8) * 8, 8)
    rows = pl.ds(i * block_m, block_m)

    def window_copy(kv, phase):
        src_dst = (cache_ref.at[kv, layer, rows, :, :, pl.ds(pa, 8)],
                   wbuf.at[kv])
        if phase == 1:
            src_dst = (wbuf.at[kv],
                       cache_out.at[kv, layer, rows, :, :, pl.ds(pa, 8)])
        return pltpu.make_async_copy(*src_dst, append_sems.at[phase, kv])

    window_copy(0, 0).start()
    window_copy(1, 0).start()

    mb, h, k, d = q_ref.shape
    T = kbuf.shape[4]
    q = q_ref[...].astype(jnp.float32)                    # [MB, h, k, D]
    qf = q.reshape(mb * h, k, d)
    # per-lane scores: Mosaic rejects minor-dim splits/merges ((k, T) <->
    # k*T reshapes of the score/cache tensors), so the k cache lanes are a
    # short python loop — reshapes below only merge/split LEADING dims.
    scores = []                                           # l -> [MB, h, k, T]
    for l in range(k):
        kc_l = kbuf[slot][:, :, l].astype(jnp.float32)    # [MB, h, T, D]
        s_l = jax.lax.dot_general(
            qf, kc_l.reshape(mb * h, T, d),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(mb, h, k, T) * scale
        scores.append(s_l + mask_ref[:, :, l][:, None])   # bcast over heads
    # dense self term: own lane's K/V at the current position
    kn = knv_ref[0, :, :, :, 0].astype(jnp.float32)       # [MB, h, k, D]
    vn = knv_ref[1, :, :, :, 0]
    s_self = jnp.sum(q * kn, axis=-1) * scale             # [MB, h, k]
    # joint softmax over [all lanes' prefixes ++ self] without concatenation
    mx = s_self
    for s_l in scores:
        mx = jnp.maximum(mx, jnp.max(s_l, axis=-1))       # [MB, h, k]
    e_self = jnp.exp(s_self - mx)
    denom = e_self
    ctx = jnp.zeros((mb * h, k, d), jnp.float32)
    for l, s_l in enumerate(scores):
        e_l = jnp.exp(s_l - mx[..., None])                # [MB, h, k, T]
        denom = denom + jnp.sum(e_l, axis=-1)
        vc_l = vbuf[slot][:, :, l]                        # [MB, h, T, D]
        ctx = ctx + jax.lax.dot_general(
            e_l.reshape(mb * h, k, T).astype(vc_l.dtype),
            vc_l.reshape(mb * h, T, d),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
    ctx = ctx.reshape(mb, h, k, d)
    ctx = ctx + e_self[..., None] * vn.astype(jnp.float32)
    ctx = ctx / denom[..., None]
    ctx_ref[...] = ctx.astype(ctx_ref.dtype)

    # merge the new K/V into the window and write it back
    window_copy(0, 0).wait()
    window_copy(1, 0).wait()
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, mb, h, k, 8, 1), 4)
    wbuf[...] = jnp.where(row_ids == pos - pa, knv_ref[...], wbuf[...])
    window_copy(0, 1).start()
    window_copy(1, 1).start()
    window_copy(0, 1).wait()
    window_copy(1, 1).wait()


@functools.partial(
    jax.jit,
    static_argnames=("layer", "block_m", "head_dim", "interpret"))
def beam_decode_attention(
    q: jnp.ndarray,           # [m, h, k, D] current queries
    k_new: jnp.ndarray,       # [m, h, k, D] current K
    v_new: jnp.ndarray,       # [m, h, k, D] current V
    cache: jnp.ndarray,       # [2, L, m, h, k, T, Dp] full beam cache
    mask: jnp.ndarray,        # [m, k, k, T] additive fp32 prefix mask (t<pos)
    pos: jnp.ndarray,         # scalar int32
    layer: int,
    block_m: int = 8,
    head_dim: Optional[int] = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One layer's fused cache-append + ancestry-masked beam attention.

    Returns (ctx [m, h, k, D], cache) where ``cache`` is the SAME buffer
    updated in place (input_output_aliases) with k_new/v_new written at
    ``pos``.  Callers must thread the returned cache into the next use.

    The cache's head dim Dp may be 128 (lane-tile padded) while the model's
    head_dim is smaller: Mosaic requires DMA slice extents along the lane
    dim to be 128-aligned, and the physical HBM buffer is lane-padded to 128
    either way, so allocating the padding logically costs nothing.  q/k/v
    are zero-padded here (zeros add 0 to scores and context) and the
    returned ctx is sliced back to head_dim; softmax scale uses the TRUE
    head_dim.
    """
    m, h, k, d = q.shape
    head_dim = head_dim or d
    T, dp = cache.shape[5], cache.shape[6]
    assert m % block_m == 0, (m, block_m)
    assert T % 8 == 0, f"cache T={T} must be 8-aligned (Mosaic DMA tiling)"
    if dp != d:
        assert dp % 128 == 0 or interpret, (dp, d)
        padw = [(0, 0)] * 3 + [(0, dp - d)]
        q = jnp.pad(q, padw)
        k_new = jnp.pad(k_new, padw)
        v_new = jnp.pad(v_new, padw)
        d = dp
    n_blocks = m // block_m
    knv = jnp.stack([k_new, v_new])[:, :, :, :, None, :]  # [2, m, h, k, 1, D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_m, h, k, d), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, block_m, h, k, 1, d),
                         lambda i, p: (0, i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, k, k, T), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((block_m, h, k, d), lambda i, p: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, block_m, h, k, T, d), cache.dtype),
            pltpu.VMEM((2, block_m, h, k, T, d), cache.dtype),
            pltpu.VMEM((2, block_m, h, k, 8, d), cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    slab_bytes = 2 * m * h * k * T * d * cache.dtype.itemsize
    ctx, cache = pl.pallas_call(
        functools.partial(_kernel, layer=layer, block_m=block_m,
                          scale=head_dim ** -0.5),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((m, h, k, d), q.dtype),
            jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        ],
        # inputs: [pos, q, knv, mask, cache]; cache input index 4 -> out 1
        input_output_aliases={4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * h * k * k * T * d,
            bytes_accessed=slab_bytes,
            transcendentals=m * h * k * (k * T + 1),
        ),
        interpret=interpret,
    )(pos.reshape(1).astype(jnp.int32), q, knv, mask, cache)
    return ctx[..., :head_dim], cache
