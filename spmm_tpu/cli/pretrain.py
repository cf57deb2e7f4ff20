"""SPMM pretraining CLI (reference SPMM_pretrain.py).

Data-parallel over every visible device via a 1-D 'dp' mesh (the TPU-native
equivalent of the reference's 8-GPU DDP); Orbax checkpoint every
``--save_every`` steps (reference ModelCheckpoint every_n_train_steps=10000);
resume via --resume pointing at an Orbax state dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import PretrainConfig
from spmm_tpu.checkpoint.io import (
    AsyncSaver, restore_checkpoint, save_checkpoint,
)
from spmm_tpu.cli._common import make_tokenizer, seed_everything
from spmm_tpu.data.datasets import PretrainDataset
from spmm_tpu.data.pipeline import batch_pretrain, prefetch
from spmm_tpu.parallel.mesh import data_parallel_mesh, replicated
from spmm_tpu.training.pretrain import init_pretrain_state, make_pretrain_step
from spmm_tpu.utils.logging import MetricLogger
from spmm_tpu.utils.prng import add_prng_arg, set_default_prng
from spmm_tpu.utils.profiling import compiled_flops, mfu


def main(argv=None):
    p = argparse.ArgumentParser()
    add_prng_arg(p)
    p.add_argument("--data_path", required=True)
    p.add_argument("--property_cache", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--output_dir", default="./Pretrain")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--batch_size", type=int, default=96,
                   help="per-device batch (reference: 96 x 8 devices)")
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--queue_size", type=int, default=36864)
    p.add_argument("--save_every", type=int, default=10000)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--bf16", action="store_true",
                   help="bf16 encoder compute (reference: fp16 AMP)")
    p.add_argument("--remat", action="store_true",
                   help="objective+layer rematerialization (memory for FLOPs)")
    p.add_argument("--bf16_moments", action="store_true",
                   help="bf16 Adam first moment (halves one optimizer-state "
                        "copy)")
    p.add_argument("--zero1", action="store_true",
                   help="shard optimizer state + EMA over the dp mesh "
                        "(ZeRO-1; params stay replicated)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel factor: devices form a 2-D dp x tp "
                        "mesh and params/EMA/optimizer state are "
                        "Megatron-sharded over tp (parallel/tp.py); must "
                        "divide the head count (12); mutually exclusive "
                        "with --zero1")
    p.add_argument("--fsdp", type=int, default=1,
                   help="fully-sharded data parallelism (ZeRO-3): devices "
                        "form a 2-D dp x fsdp mesh and EVERY state leaf "
                        "(params, EMA, both Adam moments) is sharded over "
                        "fsdp (parallel/fsdp.py); at-rest state memory is "
                        "~1/fsdp per chip; mutually exclusive with --tp and "
                        "--zero1")
    p.add_argument("--sp", action="store_true",
                   help="Megatron sequence parallelism on top of --tp: the "
                        "residual-stream LayerNorm/dropout regions run "
                        "seq-sharded over the tp group (parallel/sp.py); "
                        "requires --tp > 1")
    p.add_argument("--accum", type=int, default=1,
                   help="gradient-accumulation microbatches per step "
                        "(activation peak scales with batch/accum; in-batch "
                        "negatives become microbatch-local, = reference DDP "
                        "semantics on accum-fold more ranks)")
    p.add_argument("--donate", action="store_true",
                   help="donate state buffers: halves state HBM and, on "
                        "remote runtimes that charge a round-trip per new "
                        "output buffer, removes the multi-minute allocation "
                        "storm on the first two steps (recommended on TPU)")
    p.add_argument("--metrics_log", default=None,
                   help="JSONL metrics path (default <output_dir>/metrics.jsonl)")
    p.add_argument("--async_save", action="store_true",
                   help="non-blocking Orbax checkpoint writes (serialization "
                        "+ disk IO overlap the next training steps)")
    args = p.parse_args(argv)

    if args.sp and args.tp <= 1:
        p.error("--sp requires --tp > 1 (sequence parallelism shards over "
                "the tensor-parallel group)")
    if args.fsdp > 1 and (args.tp > 1 or args.zero1):
        p.error("--fsdp is mutually exclusive with --tp/--zero1 (fsdp "
                "already shards params, EMA and optimizer state; ZeRO-3 "
                "subsumes ZeRO-1, and tp/fsdp shard the same leaves)")
    set_default_prng(args.prng)   # before the first PRNGKey
    seed = seed_everything(args.seed)
    tok = make_tokenizer()
    if args.tp > 1:
        from spmm_tpu.configs import text_config
        from spmm_tpu.parallel.tp import assert_tp_compatible, dp_tp_mesh

        assert not args.zero1, "--tp and --zero1 are mutually exclusive"
        assert_tp_compatible(text_config(), args.tp)
        mesh = dp_tp_mesh(tp=args.tp)
    elif args.fsdp > 1:
        from spmm_tpu.parallel.fsdp import dp_fsdp_mesh

        mesh = dp_fsdp_mesh(fsdp=args.fsdp)
    else:
        mesh = data_parallel_mesh()
    n_dev = dict(mesh.shape)["dp"]   # dp extent: per-device batch is per dp shard
    global_bs = args.batch_size * n_dev
    assert args.queue_size % global_bs == 0, (
        "queue_size must divide by global batch")

    ds = PretrainDataset(args.data_path, property_cache=args.property_cache)
    steps_per_epoch = len(ds) // global_bs
    print(f"#data: {len(ds)}  devices: {n_dev}  global batch: {global_bs}  "
          f"steps/epoch: {steps_per_epoch}")

    pcfg = PretrainConfig(batch_size=args.batch_size, epochs=args.epochs,
                          queue_size=args.queue_size,
                          bf16_compute=args.bf16, remat=args.remat,
                          bf16_moments=args.bf16_moments, zero1=args.zero1)
    # jit the init: eager init dispatches thousands of tiny ops, each a
    # remote round-trip on the axon runtime (~minutes of setup)
    state = jax.jit(init_pretrain_state, static_argnums=(1,))(
        jax.random.PRNGKey(seed), pcfg)
    if args.resume:
        state = restore_checkpoint(args.resume, state)
        print("resumed at step", int(state["step"]))
        # the fast-forward below recomputes the data position from the
        # CURRENT seed/global batch; a resume under different values lands
        # the loader on the wrong samples with no error, so check against
        # the run metadata written next to the original checkpoints
        meta_path = os.path.join(os.path.dirname(os.path.abspath(args.resume)),
                                 "run_meta.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            for key, cur in (("global_bs", global_bs), ("seed", seed),
                             ("n_dev", n_dev)):
                if meta.get(key, cur) != cur:
                    print(f"WARNING: resume {key}={cur} differs from the "
                          f"original run's {meta[key]} ({meta_path}) — the "
                          "data fast-forward will land at a different "
                          "position (duplicated/skipped samples)",
                          file=sys.stderr)
        else:
            print(f"WARNING: no run_meta.json next to {args.resume}; cannot "
                  "verify the resume uses the original batch size/seed",
                  file=sys.stderr)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "run_meta.json"), "w") as f:
        json.dump({"global_bs": global_bs, "seed": seed, "n_dev": n_dev,
                   "batch_size": args.batch_size}, f)

    # place the state over the mesh up front: a single-device-committed
    # state would recompile the step on its second call (sharding change)
    if args.zero1:
        from spmm_tpu.training.pretrain import pretrain_state_shardings

        state = jax.device_put(state, pretrain_state_shardings(state, mesh))
    elif args.tp > 1:
        # Megatron layout for params/EMA and (by dict-path match through the
        # optax tree) the Adam moments; queue/step fall through to replicated
        from spmm_tpu.parallel.tp import tp_shardings

        state = jax.device_put(state, tp_shardings(state, mesh))
    elif args.fsdp > 1:
        # ZeRO-3 at rest: every params/EMA/moment leaf ~1/fsdp per chip
        from spmm_tpu.parallel.fsdp import fsdp_state_shardings

        state = jax.device_put(state, fsdp_state_shardings(state, mesh))
    else:
        state = jax.device_put(state, replicated(mesh))
    # NOTE: donate=True halves state HBM and avoids the axon runtime's
    # per-new-buffer allocation storm on the first two steps (~0.4 s per
    # output leaf; the r2-era INVALID_ARGUMENT on donation is fixed
    # runtime-side, re-verified r4).  Kept opt-in because a donated AOT
    # call invalidates the previous state reference for host-side reuse.
    fsdp_out = None
    if args.fsdp > 1:
        from spmm_tpu.parallel.fsdp import fsdp_state_shardings

        fsdp_out = fsdp_state_shardings(state, mesh)
    step_fn = make_pretrain_step(mesh, pcfg, steps_per_epoch,
                                 donate=args.donate, accum=args.accum,
                                 sp=args.sp, state_shardings=fsdp_out)
    rng = jax.random.PRNGKey(seed + 1)
    logger = MetricLogger(args.metrics_log
                          or f"{args.output_dir}/metrics.jsonl")
    saver = AsyncSaver() if args.async_save else None
    save = saver.save if saver else save_checkpoint

    # resume fast-forward: the step counter is authoritative (the schedule
    # and alpha ramp key on it), so the data loop must continue from the
    # same epoch/batch position instead of replaying epoch 0 (reference:
    # PL ckpt_path restores the loader state, SPMM_pretrain.py:24-26,37)
    start_step = int(state["step"])
    start_epoch = min(start_step // steps_per_epoch, args.epochs)
    if args.resume and start_step:
        print(f"resume fast-forward: epoch {start_epoch}, "
              f"skipping {start_step % steps_per_epoch} batches")
    try:
        _train_loop(args, state, step_fn, tok, ds, rng, logger, save,
                    global_bs, steps_per_epoch, start_epoch, start_step,
                    seed, mesh)
    finally:
        # always land: an exception mid-loop must not abandon an in-flight
        # async write or swallow a deferred Orbax error from an earlier save
        logger.close()
        if saver:
            saver.close()


def _train_loop(args, state, step_fn, tok, ds, rng, logger, save, global_bs,
                steps_per_epoch, start_epoch, start_step, seed, mesh):
    compiled = {}            # AOT executable per batch ids.shape: bucket
    flops_per_step = None    # padding produces several shapes per epoch, and
                             # an AOT executable rejects any other shape; the
                             # cost analysis (MFU) reuses the first executable
    losses = []
    t0 = time.time()
    for epoch in range(start_epoch, args.epochs):
        skip = start_step % steps_per_epoch if epoch == start_epoch else 0
        batches = prefetch(batch_pretrain(
            tok, ds, global_bs, shuffle=True, seed=seed + epoch,
            skip_batches=skip), depth=4)
        for b in batches:
            batch = {k: jnp.asarray(v) for k, v in b.items()}
            step_rng = jax.random.fold_in(rng, int(state["step"]))
            shape_key = batch["ids"].shape
            if shape_key not in compiled:
                compiled[shape_key] = step_fn.lower(
                    state, batch, step_rng).compile()
                if flops_per_step is None:
                    flops_per_step = compiled_flops(compiled[shape_key])
            state, metrics = compiled[shape_key](state, batch, step_rng)
            step = int(state["step"])
            losses.append([float(metrics[k]) for k in
                           ("loss_mlm", "loss_mpm", "loss_ita", "loss_itm")])
            logger.log(step, {k: metrics[k] for k in
                              ("loss", "loss_mlm", "loss_mpm", "loss_ita",
                               "loss_itm", "lr")})
            if step % 50 == 0:
                m = np.mean(losses[-50:], axis=0)
                dt = time.time() - t0
                step_time = dt / 50
                util = mfu(flops_per_step, step_time, mesh.devices.size)
                util_s = f" mfu {util:.1%}" if util else ""
                print(f"step {step} lr {float(metrics['lr']):.2e} "
                      f"mlm {m[0]:.4f} mpm {m[1]:.4f} ita {m[2]:.4f} "
                      f"itm {m[3]:.4f} ({global_bs * 50 / dt:.1f} samples/s"
                      f"{util_s})")
                t0 = time.time()
            if step % args.save_every == 0:
                save(f"{args.output_dir}/step_{step}", state)
            if args.max_steps and step >= args.max_steps:
                if step % args.save_every != 0:   # not already saved above:
                    # a boundary double-save would delete-and-rewrite the
                    # just-committed checkpoint (a crash in between loses it)
                    save(f"{args.output_dir}/step_{step}", state)
                return
        m = np.mean(losses[-1000:], axis=0)
        print(f"\n mean loss: {m[0]:.4f}, {m[1]:.4f}, {m[2]:.4f}, {m[3]:.4f}")
        losses.clear()
    save(f"{args.output_dir}/final", state)


if __name__ == "__main__":
    main()
