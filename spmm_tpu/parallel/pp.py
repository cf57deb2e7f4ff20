"""Pipeline parallelism (GPipe) over a 'pp' mesh axis.

The reference has no pipeline parallelism (its only axis is DDP, reference
SPMM_pretrain.py:35-36), and this model family never *needs* it — 12 layers
of a 110M-param model fit one chip with room to spare (docs/SCALING.md).
This module is the framework building block anyway: a microbatch-pipelined
forward for a **homogeneous** layer stack, built the TPU-native way —
`shard_map` over a 'pp' axis, `lax.ppermute` stage-to-stage activation
transfer riding ICI, and a `lax.scan` schedule, all differentiable (the
transpose of ppermute is the reverse ppermute, so `jax.grad` derives the
backward pipeline automatically).

The homogeneous stack this applies to here is the truncated unimodal
encoder — self-attention-only layers [0, fusion_layer) — which is exactly
the encoder every MoleculeNet fine-tune runs (reference d_classification.py:33
replaces layers >= fusion_layer with Identity).  Fusion layers carry
cross-attention params and would make stages structurally unequal; pipeline
the text section and run the (tiny) embeddings/heads replicated.

Schedule: S stages, M microbatches, T = M + S - 1 ticks.  At tick t, stage
s runs microbatch t - s (bubble ticks compute throwaway values that are
never deposited); stage 0 injects microbatch t, stage S-1 deposits
microbatch t - (S - 1).  Outputs accumulate on the last stage only and one
final `psum` over 'pp' replicates them (every other stage contributes
zeros).  Bubble fraction is the classic GPipe (S-1)/(M+S-1).

Dropout is not threaded through the schedule (deterministic forwards only
— inference and the fine-tune eval path); training through the pipeline
works for deterministic losses, as the grad equivalence test shows
(tests/test_pipeline_parallel.py).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from spmm_tpu.configs import BertArchConfig
from spmm_tpu.models.bert import layer_forward

PP_AXIS = "pp"

Params = dict[str, Any]


def pp_mesh(pp: int, devices: Optional[Sequence] = None) -> Mesh:
    """1-D ('pp',) mesh over the first ``pp`` visible devices."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < pp:
        raise ValueError(f"need {pp} devices for pp={pp}, have {len(devices)}")
    return Mesh(np.asarray(devices[:pp]), (PP_AXIS,))


def stack_stage_params(layers: Sequence[Params], n_stages: int) -> Params:
    """Stack a homogeneous per-layer param list into stage slabs.

    ``layers`` is the [L]-list of per-layer trees (e.g.
    ``params['layers'][:cfg.fusion_layer]``); every tree must have the same
    structure (self-attn-only text layers do).  Returns one tree whose
    leaves are [S, L//S, ...] — shard dim 0 over 'pp' to give each stage
    its own slab.
    """
    n_layers = len(layers)
    if n_layers % n_stages:
        raise ValueError(
            f"{n_layers} layers do not divide into {n_stages} stages")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    lps = n_layers // n_stages
    return jax.tree.map(
        lambda x: x.reshape((n_stages, lps) + x.shape[1:]), stacked)


def _stage_forward(stage: Params, cfg: BertArchConfig, hidden: jnp.ndarray,
                   additive_mask: jnp.ndarray) -> jnp.ndarray:
    """Run one stage's layers_per_stage self-attn layers sequentially."""
    lps = jax.tree.leaves(stage)[0].shape[0]
    for i in range(lps):
        layer = jax.tree.map(lambda x: x[i], stage)
        hidden = layer_forward(layer, cfg, hidden, additive_mask,
                               deterministic=True)
    return hidden


def pipeline_encoder_forward(
    stacked: Params,
    cfg: BertArchConfig,
    hidden: jnp.ndarray,
    additive_self_mask: jnp.ndarray,
    mesh: Mesh,
    n_microbatches: int,
) -> jnp.ndarray:
    """GPipe forward of a homogeneous self-attn layer stack.

    ``stacked``: stage slabs from :func:`stack_stage_params` (leaves
    [S, L//S, ...]).  ``hidden`` [B, L, H] and ``additive_self_mask``
    [B, 1, 1|L, L] are split into ``n_microbatches`` along batch.  Returns
    the same [B, L, H] the sequential stack produces (equivalence:
    tests/test_pipeline_parallel.py).
    """
    n_stages = dict(mesh.shape)[PP_AXIS]
    batch = hidden.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} not divisible by "
                         f"n_microbatches={n_microbatches}")
    mb = batch // n_microbatches
    micro = hidden.reshape((n_microbatches, mb) + hidden.shape[1:])
    mmask = additive_self_mask.reshape(
        (n_microbatches, mb) + additive_self_mask.shape[1:])

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(PP_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    def run(stage_slab, micro, mmask):
        # per-rank slab arrives [1, L//S, ...]
        stage = jax.tree.map(lambda x: x[0], stage_slab)
        s = jax.lax.axis_index(PP_AXIS)
        m_total = micro.shape[0]

        def tick(carry, t):
            act, out = carry
            # stage 0 injects microbatch t (clamped during drain ticks —
            # those values never reach a deposit)
            inj = jax.lax.dynamic_index_in_dim(
                micro, jnp.clip(t, 0, m_total - 1), 0, keepdims=False)
            inp = jnp.where(s == 0, inj, act)
            msk = jax.lax.dynamic_index_in_dim(
                mmask, jnp.clip(t - s, 0, m_total - 1), 0, keepdims=False)
            y = _stage_forward(stage, cfg, inp, msk)
            # last stage deposits microbatch t - (S-1) once the fill ends
            m_idx = t - (n_stages - 1)
            deposited = jax.lax.dynamic_update_index_in_dim(
                out, y, jnp.clip(m_idx, 0, m_total - 1), 0)
            valid = jnp.logical_and(s == n_stages - 1, m_idx >= 0)
            out = jnp.where(valid, deposited, out)
            # shift activations downstream (stage s -> s+1); stage 0's
            # missing source leaves zeros, which it ignores via `inj`
            act = jax.lax.ppermute(
                y, PP_AXIS, [(i, i + 1) for i in range(n_stages - 1)])
            return (act, out), None

        act0 = jnp.zeros_like(micro[0])
        out0 = jnp.zeros_like(micro)
        (_, out), _ = jax.lax.scan(
            tick, (act0, out0), jnp.arange(m_total + n_stages - 1))
        # only the last stage holds real outputs; psum replicates
        return jax.lax.psum(out, PP_AXIS)

    out = run(stacked, micro, mmask)
    return out.reshape((batch,) + hidden.shape[1:])
