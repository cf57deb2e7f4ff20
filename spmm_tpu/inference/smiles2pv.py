"""SMILES -> property-vector generation (reference d_smiles2pv.py).

The reference autoregressively decodes the 53 properties one at a time: start
from the learned property-CLS vector, and at each step (i) re-encode the whole
property prefix BIDIRECTIONALLY with the 6-layer property encoder, (ii) run
the 6 fusion layers as a causal decoder cross-attending over the SMILES
hiddens, (iii) read property i off the last position via the MTR head, and
(iv) feed the prediction back through property_embed
(reference d_smiles2pv.py:14-26,46-57).

Because the property encoder is bidirectional over a *growing* prefix, every
step's hidden states legitimately change — KV caching would alter semantics,
so the TPU implementation keeps the 53 full re-encodes but runs them as ONE
jitted ``lax.scan`` over a fixed 54-slot buffer with length masking: a single
compilation, static shapes, zero host round-trips (the reference pays 53
Python-loop device syncs per batch).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from spmm_tpu.configs import BertArchConfig, property_config, text_config
from spmm_tpu.models import bert as jbert
from spmm_tpu.models import spmm

Params = dict[str, Any]


@partial(jax.jit, static_argnames=("text_cfg", "prop_cfg", "n_properties",
                                   "attention_impl", "bf16"))
def predict_pv(
    params: Params,
    input_ids: jnp.ndarray,        # [B, L] SMILES tokens (leading CLS dropped)
    attention_mask: jnp.ndarray,   # [B, L]
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    n_properties: int = spmm.N_PROPERTIES,
    attention_impl: str = "xla",
    bf16: bool = False,
) -> jnp.ndarray:
    """Returns normalized property predictions [B, 53].

    ``attention_impl="pallas"`` runs every attention through the fused VMEM
    kernel (spmm_tpu.ops.pallas_attention) — this workload re-encodes full
    sequences 53 times, exactly where the fusion pays.

    ``bf16=True`` runs weights and activations in bfloat16 (fp32
    LayerNorm/softmax retained, fp32 scan-carried predictions); pass
    params already cast (``cast_params_bf16``) so HBM holds bf16 weights.
    Measured on v5e (r3): bf16 is ~4-13% SLOWER than fp32 here even with
    pre-cast weights (162.6 vs 169.6 mol/s @64, 193.3 vs 221.8 @128) —
    the convert ops around the fp32 LN/softmax islands break XLA's
    elementwise fusion and outweigh the traffic savings at these shapes.
    Kept for experimentation; default fp32 is both the parity path (the
    released-checkpoint golden gate, checkpoint/verify.py <=1e-4, runs
    through this function) and the fastest measured config."""
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    if bf16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    text_embeds = jbert.bert_forward(
        params["text_encoder"]["bert"], text_cfg,
        input_ids=input_ids, attention_mask=attention_mask, mode="text",
        attention_impl=attention_impl)

    # the SMILES hiddens are loop-invariant: compute every fusion layer's
    # cross-attention K/V once instead of re-projecting text_embeds through
    # the cross K/V dense layers on each of the 53 scan steps (~30-40% of
    # the per-step fusion FLOPs)
    from spmm_tpu.inference.decoding import precompute_cross_kv
    cross_kv = precompute_cross_kv(params["text_encoder"], text_cfg,
                                   text_embeds)

    b = input_ids.shape[0]
    h = text_cfg.hidden_size
    n_slots = n_properties + 1

    # Segmented scan over GROWING buffer sizes: step i only needs positions
    # <= i, so early steps run the 12-layer re-encode over a 16-slot buffer
    # instead of the full 54 (the attention mask makes the truncation exact
    # — padded slots never influence slots <= i).  Token-compute drops ~32%
    # vs a fixed 54-slot scan at the cost of one extra compile per segment.
    # Step i writes slot i+1, so segment size S carries steps i <= S - 2.
    seg_sizes = [s for s in (16, 32) if s < n_slots] + [n_slots]

    cdtype = jnp.bfloat16 if bf16 else jnp.float32
    buf = jnp.zeros((b, seg_sizes[0], h), cdtype)
    buf = buf.at[:, 0, :].set(
        jnp.broadcast_to(params["property_cls"][0, 0], (b, h)).astype(cdtype))

    def make_step(S: int):
        positions = jnp.arange(S)

        def step(buf, i):
            pmask = jnp.broadcast_to((positions <= i).astype(jnp.int32),
                                     (b, S))
            prop_embeds = jbert.bert_forward(
                params["property_encoder"], prop_cfg,
                inputs_embeds=buf, attention_mask=pmask,
                attention_impl=attention_impl)
            fused = jbert.bert_forward(
                params["text_encoder"]["bert"], text_cfg,
                encoder_embeds=prop_embeds,
                attention_mask=pmask,
                cross_kv=cross_kv,
                encoder_attention_mask=attention_mask,
                is_decoder=True,
                mode="fusion",
                attention_impl=attention_impl,
            )
            # "last position" of the active prefix = index i; run the MTR
            # head on that one position only
            last = jax.lax.dynamic_slice(fused, (0, i, 0), (b, 1, h))
            pred = spmm.mtr_head_forward(
                params["property_mtr_head"], text_cfg, last)[:, 0]  # [B]
            emb = jbert.dense(params["property_embed"],
                              pred[:, None, None])                  # [B,1,H]
            buf = jax.lax.dynamic_update_slice(buf, emb, (0, i + 1, 0))
            return buf, pred.astype(jnp.float32)

        return step

    start = 0
    preds_segs = []
    for S in seg_sizes:
        n_steps = min(S - 1, n_properties) - start
        buf, preds = jax.lax.scan(make_step(S), buf,
                                  start + jnp.arange(n_steps))
        preds_segs.append(preds)
        start += n_steps
        if S < n_slots:                      # grow the buffer for the next
            nxt = seg_sizes[seg_sizes.index(S) + 1]
            buf = jnp.pad(buf, [(0, 0), (0, nxt - S), (0, 0)])
    return jnp.concatenate(preds_segs).T                          # [B, 53]


@jax.jit
def cast_params_bf16(params: Params) -> Params:
    """One-time on-device cast so HBM holds bf16 weights (casting inside
    predict_pv's jit would read fp32 from HBM and convert on-chip, saving
    no traffic).  Note: measured on v5e the bf16 path is still slower
    than fp32 for predict_pv — see its docstring — so this is an
    experimentation hook, not the production default."""
    return jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
