"""SPMM pretraining: four objectives, momentum encoders, feature queues, and a
single jitted data-parallel train step.

Faithful re-implementation of the reference forward (SPMM_models.py:79-256)
and training_step (:348-380) in functional style:

  ITA   4-way InfoNCE (i2t/t2i/i2i/t2t) against [in-batch ⊕ queue] negatives,
        soft targets alpha-blended with momentum similarities, /temp, /2.
  ITM   structure-property matching over CLS pairs from BOTH fusion
        directions, with in-batch hard negatives sampled from the softmaxed
        similarity rows (diagonal zeroed).
  MLM   causal next-token LM over SMILES conditioned on the PV via
        cross-attention; CE over ALL positions (pads included — the reference
        uses ignore_index=-100 but pad labels are 0, SPMM_models.py:233-234)
        plus alpha-weighted distillation vs momentum logits (pads excluded).
  MPM   causal property decoding over text; MSE on the NON-masked positions
        (pred[(1-mpm_mask).bool()], SPMM_models.py:254), x5 weight.

Distributed semantics match the reference's 8-GPU DDP (SURVEY §2.3): the step
runs under ``shard_map`` over a 1-D 'dp' mesh — every shard computes the loss
over its LOCAL batch (local in-batch negatives, like per-rank DDP), grads are
``pmean``-reduced, and the momentum features are ``all_gather``-ed to update
the replicated queues (reference concat_all_gather, SPMM_models.py:389-399).

State is explicit: {params (incl. temp), ema, queue{prop,text,ptr}, opt_state,
step}.  The EMA update happens BEFORE the forward uses the momentum encoders,
matching the reference call order (SPMM_models.py:98-99).  A non-finite loss
skips the optimizer and queue updates, mirroring the reference NaN guard
(SPMM_models.py:132-133,359-364).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from spmm_tpu.configs import (
    BertArchConfig, PretrainConfig, property_config, text_config,
)
from spmm_tpu.models import bert as jbert
from spmm_tpu.models import spmm
from spmm_tpu.parallel.mesh import DP_AXIS
from spmm_tpu.training.schedules import reference_cosine_schedule

Params = dict[str, Any]

EMA_KEYS = ("property_encoder", "property_proj", "text_encoder", "text_proj")


# --------------------------------------------------------------------------- #
# state
# --------------------------------------------------------------------------- #


def make_optimizer(pcfg: PretrainConfig):
    def opt(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(pcfg.grad_clip),
            optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                        weight_decay=pcfg.weight_decay,
                        mu_dtype=jnp.bfloat16 if pcfg.bf16_moments else None),
        )

    # concrete f32 initial value: keeps the opt-state pytree identical
    # across steps (a python-float init recompiles the step once the
    # schedule writes a non-weak array into hyperparams)
    return optax.inject_hyperparams(opt)(
        learning_rate=jnp.asarray(0.0, jnp.float32))


def init_pretrain_state(
    rng: jax.Array,
    pcfg: PretrainConfig,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
) -> Params:
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    r1, r2, r3 = jax.random.split(rng, 3)
    params = spmm.init_spmm_params(r1, text_cfg, prop_cfg, pcfg.embed_dim)
    params["temp"] = jnp.asarray(pcfg.temp, jnp.float32)
    ema = {k: jax.tree.map(lambda x: x, params[k]) for k in EMA_KEYS}
    q_prop = jax.random.normal(r2, (pcfg.embed_dim, pcfg.queue_size))
    q_text = jax.random.normal(r3, (pcfg.embed_dim, pcfg.queue_size))
    queue = {
        "prop": q_prop / jnp.linalg.norm(q_prop, axis=0, keepdims=True),
        "text": q_text / jnp.linalg.norm(q_text, axis=0, keepdims=True),
        "ptr": jnp.zeros((), jnp.int32),
    }
    tx = make_optimizer(pcfg)
    return {
        "params": params,
        "ema": ema,
        "queue": queue,
        "opt_state": tx.init(params),
        "step": jnp.zeros((), jnp.int32),
    }


def pretrain_state_from_reference(
    state_dict,
    pcfg: PretrainConfig,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
) -> Params:
    """Build a RESUMABLE pretrain state from a reference torch checkpoint:
    params + temp from the checkpoint, EMA from the momentum twins, queues +
    ptr from the checkpoint buffers (falling back to fresh normalized-random
    queues when absent), fresh optimizer state, step 0.
    """
    import numpy as np

    from spmm_tpu.models.spmm import convert_spmm_checkpoint

    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    conv = convert_spmm_checkpoint(state_dict, text_cfg, prop_cfg,
                                   with_pretrain_heads=True,
                                   with_momentum=True)
    ema = conv.pop("momentum")
    params = jax.tree.map(jnp.asarray, conv)
    params["temp"] = jnp.asarray(
        float(np.asarray(state_dict.get("temp", pcfg.temp))), jnp.float32)
    ema = jax.tree.map(jnp.asarray, ema)

    fresh = init_pretrain_state(jax.random.PRNGKey(0), pcfg,
                                text_cfg, prop_cfg)
    queue = fresh["queue"]
    if "prop_queue" in state_dict:
        assert state_dict["prop_queue"].shape[1] == pcfg.queue_size, (
            "checkpoint queue size differs from config")
        queue = {
            "prop": jnp.asarray(state_dict["prop_queue"]),
            "text": jnp.asarray(state_dict["text_queue"]),
            "ptr": jnp.asarray(
                int(np.asarray(state_dict["queue_ptr"]).ravel()[0]),
                jnp.int32),
        }
    return {
        "params": params,
        "ema": ema,
        "queue": queue,
        "opt_state": make_optimizer(pcfg).init(params),
        "step": jnp.zeros((), jnp.int32),
    }


# --------------------------------------------------------------------------- #
# ZeRO-1 state sharding
# --------------------------------------------------------------------------- #


def _zero1_spec(leaf, n_dev: int):
    """Shard a state leaf's leading axis over dp when it divides; scalars and
    odd-shaped leaves stay replicated."""
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 1 and shape[0] >= n_dev and shape[0] % n_dev == 0:
        return P(DP_AXIS)
    return P()


def pretrain_state_shardings(state: Params, mesh) -> Params:
    """NamedSharding tree for a ZeRO-1 pretrain state: params/queue/step
    replicated (the forward needs whole params every step), optimizer state
    and EMA sharded leaf-wise over dp.  Use with ``jax.device_put`` before the
    first step (the reference has no equivalent — plain DDP replicates
    everything, SURVEY §2.3; this is the TPU-native memory lever that fits
    per-chip batch 96 / SPMM_pretrain.py:16 on 16G chips)."""
    from jax.sharding import NamedSharding

    n_dev = dict(mesh.shape)[DP_AXIS]
    repl = NamedSharding(mesh, P())

    def shard_tree(tree):
        return jax.tree.map(
            lambda leaf: NamedSharding(mesh, _zero1_spec(leaf, n_dev)), tree)

    return {
        "params": jax.tree.map(lambda _: repl, state["params"]),
        "ema": shard_tree(state["ema"]),
        "queue": jax.tree.map(lambda _: repl, state["queue"]),
        "opt_state": shard_tree(state["opt_state"]),
        "step": repl,
    }


# --------------------------------------------------------------------------- #
# loss
# --------------------------------------------------------------------------- #


def _normalize(x):
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True)


def pretrain_loss(
    params: Params,
    ema: Params,
    queue: Params,
    batch: Params,      # {"prop": [B,53], "ids": [B,L], "mask": [B,L]}
    rng: jax.Array,
    alpha: jnp.ndarray,
    text_cfg: BertArchConfig,
    prop_cfg: BertArchConfig,
    pcfg: PretrainConfig,
    deterministic: bool = False,
    noise_override: Optional[Params] = None,
):
    """Returns (total_loss, aux).

    ``noise_override`` optionally fixes the internally-drawn randomness
    ({"mpm_mask", "neg_prop_idx", "neg_text_idx"}) — used by the golden
    parity test against the reference loss formula.
    """
    prop_orig, ids, mask = batch["prop"], batch["ids"], batch["mask"]
    bs = prop_orig.shape[0]
    rngs = jax.random.split(rng, 13)
    noise_override = noise_override or {}

    if pcfg.bf16_compute:
        # bf16 encoder weights (LN/softmax stay fp32 inside the blocks;
        # losses, projections and heads stay fp32) — the TPU analogue of the
        # reference's fp16 AMP (SPMM_pretrain.py:35).  Grads flow back to the
        # fp32 master params through the cast.
        def _cast(t):
            return jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if x.dtype == jnp.float32 else x, t)

        params = {**params,
                  "text_encoder": _cast(params["text_encoder"]),
                  "property_encoder": _cast(params["property_encoder"])}
        ema = {**ema,
               "text_encoder": _cast(ema["text_encoder"]),
               "property_encoder": _cast(ema["property_encoder"])}

    # temperature: clamp(0.01, 0.5) with straight-through gradient
    # (reference clamps .data in-place pre-forward, SPMM_models.py:80-81)
    temp_raw = params["temp"]
    temp = temp_raw + jax.lax.stop_gradient(
        jnp.clip(temp_raw, 0.01, 0.5) - temp_raw)

    # ---- property masking: Bernoulli(0.5), 1 = masked ----
    mpm_mask = noise_override.get("mpm_mask")
    if mpm_mask is None:
        mpm_mask = jax.random.bernoulli(
            rngs[0], pcfg.mask_prob, prop_orig.shape).astype(jnp.float32)
    properties = spmm.embed_properties(params, prop_orig, mpm_mask)  # [B,54,H]

    # ---- unimodal encoders ----
    remat = pcfg.remat
    prop_embeds = spmm.encode_properties(
        params, prop_cfg, properties, deterministic=deterministic,
        rng=rngs[1], remat=remat)
    prop_atts = jnp.ones(prop_embeds.shape[:2], jnp.int32)
    prop_feat = _normalize(jbert.dense(params["property_proj"],
                                       prop_embeds[:, 0]))
    text_embeds = spmm.encode_text(
        params, text_cfg, ids, mask, deterministic=deterministic,
        rng=rngs[2], remat=remat)
    text_feat = _normalize(jbert.dense(params["text_proj"], text_embeds[:, 0]))

    # ---- momentum features (no grad; EMA already updated by the caller) ----
    prop_embeds_m = jax.lax.stop_gradient(spmm.encode_properties(
        {"property_encoder": ema["property_encoder"]},
        prop_cfg, properties, deterministic=deterministic, rng=rngs[3]))
    prop_feat_m = jax.lax.stop_gradient(_normalize(
        jbert.dense(ema["property_proj"], prop_embeds_m[:, 0])))
    text_embeds_m = jax.lax.stop_gradient(jbert.bert_forward(
        ema["text_encoder"]["bert"], text_cfg, input_ids=ids,
        attention_mask=mask, mode="text",
        deterministic=deterministic, rng=rngs[4]))
    text_feat_m = jax.lax.stop_gradient(_normalize(
        jbert.dense(ema["text_proj"], text_embeds_m[:, 0])))

    prop_feat_all = jnp.concatenate([prop_feat_m.T, queue["prop"]], axis=1)
    text_feat_all = jnp.concatenate([text_feat_m.T, queue["text"]], axis=1)

    # ---- ITA ----
    sim_i2t_m = prop_feat_m @ text_feat_all / temp
    sim_t2i_m = text_feat_m @ prop_feat_all / temp
    sim_i2i_m = prop_feat_m @ prop_feat_all / temp
    sim_t2t_m = text_feat_m @ text_feat_all / temp

    n_all = text_feat_all.shape[1]
    sim_targets = (jnp.arange(bs)[:, None] == jnp.arange(n_all)[None, :]
                   ).astype(jnp.float32)

    def soft_targets(sim_m):
        # targets are constants (reference computes them under torch.no_grad,
        # SPMM_models.py:98-119) — in particular no gradient flows to `temp`
        # through the momentum similarities
        return jax.lax.stop_gradient(
            alpha * jax.nn.softmax(sim_m, axis=1) + (1 - alpha) * sim_targets)

    sim_i2t = prop_feat @ text_feat_all / temp
    sim_t2i = text_feat @ prop_feat_all / temp
    sim_i2i = prop_feat @ prop_feat_all / temp
    sim_t2t = text_feat @ text_feat_all / temp

    def ce(sim, tgt):
        return -jnp.sum(jax.nn.log_softmax(sim, axis=1) * tgt, axis=1).mean()

    loss_ita = (ce(sim_i2t, soft_targets(sim_i2t_m))
                + ce(sim_t2i, soft_targets(sim_t2i_m))
                + ce(sim_i2i, soft_targets(sim_i2i_m))
                + ce(sim_t2t, soft_targets(sim_t2t_m))) / 2.0

    # Objective-level rematerialization: in one fused backward, every
    # objective's forward residuals live until its backward segment runs, so
    # the four objectives' residuals stack (~10GB at full size; barriers only
    # pin more).  Wrapping each heavy objective in jax.checkpoint keeps only
    # its small INPUTS resident and recomputes its internals during the
    # backward — the objectives' residuals no longer coexist.
    def _objective_ckpt(f):
        return jax.checkpoint(f, prevent_cse=False) if pcfg.remat else f

    # ---- ITM with in-batch hard negatives ----
    # hard-negative sampling is discrete and gradient-free (reference
    # computes the weights under no_grad, SPMM_models.py:154-161)
    weights_i2t = jax.nn.softmax(jax.lax.stop_gradient(sim_i2t[:, :bs]), axis=1)
    weights_t2i = jax.nn.softmax(jax.lax.stop_gradient(sim_t2i[:, :bs]), axis=1)
    diag = jnp.eye(bs, dtype=bool)
    log_w_i2t = jnp.log(jnp.where(diag, 0.0, weights_i2t) + 1e-30)
    log_w_t2i = jnp.log(jnp.where(diag, 0.0, weights_t2i) + 1e-30)
    neg_prop_idx = noise_override.get(
        "neg_prop_idx",
        jax.random.categorical(rngs[5], log_w_t2i, axis=1))  # [B]
    neg_text_idx = noise_override.get(
        "neg_text_idx",
        jax.random.categorical(rngs[6], log_w_i2t, axis=1))  # [B]

    def _itm(prop_embeds, text_embeds):
        prop_embeds_neg = prop_embeds[neg_prop_idx]
        text_embeds_neg = text_embeds[neg_text_idx]
        text_atts_neg = mask[neg_text_idx]
        # fused pos+neg fusion passes (batch-independent => identical
        # numerics to the reference's separate pos / neg calls,
        # SPMM_models.py:137-199)
        prop_q = jnp.concatenate([prop_embeds, prop_embeds_neg, prop_embeds])
        text_k = jnp.concatenate([text_embeds, text_embeds, text_embeds_neg])
        text_k_mask = jnp.concatenate([mask, mask, text_atts_neg])
        prop_side = jbert.bert_forward(
            params["text_encoder"]["bert"], text_cfg,
            encoder_embeds=prop_q,
            attention_mask=jnp.tile(prop_atts, (3, 1)),
            encoder_hidden_states=text_k, encoder_attention_mask=text_k_mask,
            mode="fusion", deterministic=deterministic, rng=rngs[7],
            remat=remat,
        )[:, 0]
        text_q = jnp.concatenate([text_embeds, text_embeds, text_embeds_neg])
        text_q_mask = jnp.concatenate([mask, mask, text_atts_neg])
        prop_k = jnp.concatenate([prop_embeds, prop_embeds_neg, prop_embeds])
        text_side = jbert.bert_forward(
            params["text_encoder"]["bert"], text_cfg,
            encoder_embeds=text_q, attention_mask=text_q_mask,
            encoder_hidden_states=prop_k,
            encoder_attention_mask=jnp.tile(prop_atts, (3, 1)),
            mode="fusion", deterministic=deterministic, rng=rngs[8],
            remat=remat,
        )[:, 0]
        vl = jnp.concatenate([prop_side, text_side], axis=-1)  # [3B, 1536]
        itm_logits = jbert.dense(params["itm_head"], vl)
        itm_labels = jnp.concatenate(
            [jnp.ones((bs,), jnp.int32), jnp.zeros((2 * bs,), jnp.int32)])
        return -jnp.take_along_axis(
            jax.nn.log_softmax(itm_logits, axis=-1),
            itm_labels[:, None], axis=1)[:, 0].mean()

    loss_itm = _objective_ckpt(_itm)(prop_embeds, text_embeds)

    # ---- MLM (causal next-token with PV conditioning + distillation) ----
    # momentum logits are gradient-free: compute once outside the checkpoint
    # and pass them in (7MB beats a 12-layer recompute)
    logits_m = jax.lax.stop_gradient(jbert.mlm_forward(
        ema["text_encoder"], text_cfg, input_ids=ids, attention_mask=mask,
        encoder_hidden_states=prop_embeds_m, encoder_attention_mask=prop_atts,
        is_decoder=True, deterministic=deterministic, rng=rngs[9],
    ))[:, :-1, :]

    def _mlm(prop_embeds, logits_m):
        mlm_logits = jbert.mlm_forward(
            params["text_encoder"], text_cfg, input_ids=ids,
            attention_mask=mask, encoder_hidden_states=prop_embeds,
            encoder_attention_mask=prop_atts, is_decoder=True,
            deterministic=deterministic, rng=rngs[10], remat=remat,
        )[:, :-1, :]
        labels = ids[:, 1:]
        logp = jax.nn.log_softmax(mlm_logits, axis=-1)
        # plain mean CE over ALL positions (pads included; module docstring)
        loss_ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1).mean()
        distill = -jnp.sum(logp * jax.nn.softmax(logits_m, axis=-1), axis=-1)
        keep = (labels != 0).astype(jnp.float32)
        loss_distill = jnp.sum(distill * keep) / jnp.maximum(keep.sum(), 1.0)
        return (1 - alpha) * loss_ce + alpha * loss_distill

    loss_mlm = _objective_ckpt(_mlm)(prop_embeds, logits_m)

    # ---- MPM (causal property regression over text) ----
    def _mpm(properties, text_embeds):
        prop_embeds_causal = spmm.encode_properties(
            params, prop_cfg, properties, is_decoder=True,
            deterministic=deterministic, rng=rngs[11], remat=remat)
        prop_out = jbert.bert_forward(
            params["text_encoder"]["bert"], text_cfg,
            encoder_embeds=prop_embeds_causal, attention_mask=prop_atts,
            encoder_hidden_states=text_embeds, encoder_attention_mask=mask,
            is_decoder=True, mode="fusion", deterministic=deterministic,
            rng=rngs[12], remat=remat,
        )[:, :-1, :]
        pred = spmm.mtr_head_forward(params["property_mtr_head"], text_cfg,
                                     prop_out)
        keep_p = 1.0 - mpm_mask
        return (jnp.sum(jnp.square(pred - prop_orig) * keep_p)
                / jnp.maximum(keep_p.sum(), 1.0))

    loss_mpm = _objective_ckpt(_mpm)(properties, text_embeds)

    total = loss_mlm + pcfg.mpm_weight * loss_mpm + loss_ita + loss_itm
    aux = {
        "loss_mlm": loss_mlm,
        "loss_mpm": pcfg.mpm_weight * loss_mpm,
        "loss_ita": loss_ita,
        "loss_itm": loss_itm,
        "prop_feat_m": prop_feat_m,
        "text_feat_m": text_feat_m,
    }
    return total, aux


# --------------------------------------------------------------------------- #
# train step
# --------------------------------------------------------------------------- #


def ema_update(ema: Params, params: Params, momentum: float) -> Params:
    sub = {k: params[k] for k in EMA_KEYS}
    return jax.tree.map(lambda e, p: e * momentum + p * (1.0 - momentum),
                        ema, sub)


def make_pretrain_step(
    mesh,
    pcfg: PretrainConfig,
    steps_per_epoch: int,
    text_cfg: Optional[BertArchConfig] = None,
    prop_cfg: Optional[BertArchConfig] = None,
    donate: bool = False,
    accum: int = 1,
    sp: bool = False,
    state_shardings=None,
):
    """Builds the jitted data-parallel train step.

    batch arrays are GLOBAL (sharded on axis 0 over 'dp'); the queue size must
    divide by the global batch (reference assert, SPMM_models.py:279).

    ``donate=True`` donates the state buffers (params/EMA/opt_state/queue are
    updated in place, saving ~2GB HBM for the full-size model) — the caller
    must not touch the old state afterwards (training loops; not tests).

    ``accum=N`` splits the global batch into N sequential microbatches and
    averages their gradients (activation peak scales with the microbatch).
    In-batch ITA/ITM negatives become microbatch-local — exactly the
    semantics of running the reference's DDP on N-fold more ranks (per-rank
    in-batch negatives, SURVEY §2.3); the queue still receives every
    momentum feature of the full global batch.

    ``sp=True`` adds Megatron-style sequence parallelism on top of tensor
    parallelism: the residual-stream LayerNorm/dropout regions are sharded
    along the sequence dim over the mesh's 'tp' axis (parallel/sp.py).
    Requires a mesh with a 'tp' axis; numerics are unchanged
    (tests/test_sequence_parallel.py).
    """
    text_cfg = text_cfg or text_config()
    prop_cfg = prop_cfg or property_config()
    tx = make_optimizer(pcfg)
    schedule = reference_cosine_schedule(
        pcfg.lr, pcfg.min_lr, pcfg.warmup_lr, pcfg.epochs,
        pcfg.warmup_epochs, steps_per_epoch, step_size=100)

    # dp is the mesh's manual axis (explicit pmean/all_gather below — DDP
    # semantics); any further axes ('tp') stay under GSPMD, so params placed
    # with Megatron shardings (parallel/tp.py) are tensor-parallel INSIDE
    # each dp shard with compiler-inserted all-reduces.  dp-dependent sizes
    # (queue layout, ZeRO-1 leaf sharding) use the dp extent, not the device
    # count.
    dp_size = dict(mesh.shape)[DP_AXIS]
    if pcfg.zero1 and mesh.devices.size != dp_size:
        raise ValueError(
            "zero1 + a second mesh axis (tp/fsdp) are not composed: ZeRO-1 "
            "shards state leaves over dp while tp/fsdp shard them over "
            "their own axis — pick one (both already split the optimizer "
            "state with the params)")

    if sp:
        from spmm_tpu.parallel.sp import sequence_parallel
        from spmm_tpu.parallel.tp import TP_AXIS
        if TP_AXIS not in mesh.axis_names:
            raise ValueError("sp=True requires a mesh with a 'tp' axis "
                             "(sequence parallelism shards over the tensor-"
                             f"parallel group); got {mesh.axis_names}")

        def _sp_ctx():
            return sequence_parallel(mesh)
    else:
        from contextlib import nullcontext

        def _sp_ctx():
            return nullcontext()

    def local_grads(params, ema, queue, batch, rng, alpha):
        # per-shard rng (distinct dropout/masking per device, like DDP ranks)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DP_AXIS))
        grad_fn = jax.value_and_grad(pretrain_loss, has_aux=True)
        with _sp_ctx():
            (loss, aux), grads = grad_fn(
                params, ema, queue, batch, rng, alpha,
                text_cfg, prop_cfg, pcfg)
        grads = jax.lax.pmean(grads, DP_AXIS)
        loss = jax.lax.pmean(loss, DP_AXIS)
        metrics = {k: jax.lax.pmean(aux[k], DP_AXIS)
                   for k in ("loss_mlm", "loss_mpm", "loss_ita", "loss_itm")}
        prop_feats = jax.lax.all_gather(
            aux["prop_feat_m"], DP_AXIS, tiled=True)     # [B_global, E]
        text_feats = jax.lax.all_gather(aux["text_feat_m"], DP_AXIS, tiled=True)
        return grads, loss, metrics, prop_feats, text_feats

    sharded_grads = shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), P(), P(), P(DP_AXIS), P(), P()),
        out_specs=(P(), P(), P(), P(), P()),
        axis_names={DP_AXIS},
        check_vma=False,
    )

    # ``state_shardings`` pins the OUTPUT state layout (e.g. the ZeRO-3
    # fsdp placement, parallel/fsdp.py): without it GSPMD is free to emit
    # some leaves replicated, and the CLI's AOT executable — compiled for
    # the sharded input state — would reject its own output on step 2
    @partial(jax.jit, donate_argnums=(0,) if donate else (),
             out_shardings=(state_shardings, None))
    def train_step(state, batch, rng):
        # queue wraparound never happens when this divides (reference assert,
        # SPMM_models.py:279); dynamic_update_slice would clamp otherwise
        assert pcfg.queue_size % batch["prop"].shape[0] == 0, (
            "queue_size must be divisible by the global batch size")
        step = state["step"]
        epoch = step // steps_per_epoch
        batch_idx = step % steps_per_epoch
        # alpha ramp over epoch 0 (reference SPMM_models.py:355)
        alpha = jnp.where(
            epoch > 0, pcfg.alpha,
            pcfg.alpha * jnp.minimum(1.0, batch_idx / steps_per_epoch))

        # EMA momentum update BEFORE the forward uses the momentum encoders
        ema = ema_update(state["ema"], state["params"], pcfg.momentum)
        if pcfg.zero1:
            from jax.sharding import NamedSharding
            ema = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _zero1_spec(x, dp_size))), ema)

        if accum == 1:
            grads, loss, metrics, prop_feats, text_feats = sharded_grads(
                state["params"], ema, state["queue"], batch, rng, alpha)
        else:
            gb = batch["prop"].shape[0]
            assert gb % accum == 0, "global batch must divide by accum"
            micro = jax.tree.map(
                lambda x: x.reshape((accum, gb // accum) + x.shape[1:]),
                batch)

            # unrolled python loop (NOT lax.scan: scan-of-shard_map
            # compiles pathologically); the optimization_barrier ties each
            # microbatch's rng to the previous accumulation so XLA cannot
            # overlap two microbatches' forwards — the activation peak stays
            # that of ONE microbatch, which is the whole point
            g_sum = l_sum = m_sum = None
            feats = []
            for i in range(accum):
                mb = jax.tree.map(lambda x: x[i], micro)
                mb_rng = jax.random.fold_in(rng, i)
                if g_sum is not None:
                    mb_rng, g_sum = jax.lax.optimization_barrier(
                        (mb_rng, g_sum))
                g, l, m, pf, tf = sharded_grads(
                    state["params"], ema, state["queue"], mb, mb_rng, alpha)
                feats.append((pf, tf))
                if g_sum is None:
                    g_sum, l_sum, m_sum = g, l, m
                else:
                    g_sum = jax.tree.map(jnp.add, g_sum, g)
                    l_sum = l_sum + l
                    m_sum = jax.tree.map(jnp.add, m_sum, m)
            grads = jax.tree.map(lambda g: g / accum, g_sum)
            loss = l_sum / accum
            metrics = jax.tree.map(lambda m: m / accum, m_sum)
            prop_feats = jnp.concatenate([f[0] for f in feats])
            text_feats = jnp.concatenate([f[1] for f in feats])

        finite = jnp.isfinite(loss)
        lr = schedule(step)

        def do_update(operand):
            params, opt_state, queue = operand
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            # keep the stored temperature inside its clamp range
            new_params["temp"] = jnp.clip(new_params["temp"], 0.01, 0.5)
            # queue dequeue/enqueue (reference SPMM_models.py:271-286)
            gb = prop_feats.shape[0]
            ptr = queue["ptr"]
            # modular scatter: safe even when a restored ptr is not aligned
            # to the current global batch (dynamic_update_slice would clamp
            # at the right edge and corrupt the queue)
            cols = (ptr + jnp.arange(gb)) % pcfg.queue_size
            new_queue = {
                "prop": queue["prop"].at[:, cols].set(prop_feats.T),
                "text": queue["text"].at[:, cols].set(text_feats.T),
                "ptr": (ptr + gb) % pcfg.queue_size,
            }
            return new_params, new_opt, new_queue

        def skip_update(operand):
            return operand

        new_params, new_opt, new_queue = jax.lax.cond(
            finite, do_update, skip_update,
            (state["params"], state["opt_state"], state["queue"]))
        if pcfg.zero1:
            from jax.sharding import NamedSharding
            new_opt = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, _zero1_spec(x, dp_size))), new_opt)

        new_state = {
            "params": new_params,
            "ema": ema,
            "queue": new_queue,
            "opt_state": new_opt,
            "step": step + 1,
        }
        metrics = {**metrics, "loss": loss, "lr": lr,
                   "skipped": jnp.logical_not(finite)}
        return new_state, metrics

    return train_step
