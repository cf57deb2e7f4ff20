"""Reaction prediction fine-tune + eval CLI (reference d_rxn_prediction.py).

--mode forward (USPTO-480k tsv) or retro (USPTO-50k pickle); greedy decode
for n_beam=1, per-sample k-beam otherwise; metric: top-k canonical-SMILES
exact-match accuracy; best-val checkpoint saved via Orbax.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import FinetuneConfig, smiles_config, text_config
from spmm_tpu.checkpoint.convert import load_torch_state_dict
from spmm_tpu.checkpoint.io import (
    is_torch_checkpoint, restore_checkpoint, save_checkpoint,
)
from spmm_tpu.chem.featurizer import canonicalize
from spmm_tpu.cli._common import make_tokenizer, seed_everything
from spmm_tpu.utils.prng import add_prng_arg, set_default_prng
from spmm_tpu.data.datasets import USPTODataset, USPTORetroDataset
from spmm_tpu.data.pipeline import batch_pairs, prefetch
from spmm_tpu.inference.rxn import predict_beam, predict_greedy
from spmm_tpu.models.rxn import (
    init_rxn_params, load_encoder_from_pretrain,
    load_encoder_from_pretrain_tree,
)
from spmm_tpu.parallel.mesh import auto_mesh
from spmm_tpu.training.finetune import make_rxn_step
from spmm_tpu.utils.logging import MetricLogger


def load_rxn_checkpoint(params, path: str, encoder_cfg):
    """Route a --checkpoint path to the right loader (reference
    d_rxn_prediction.py:160-168 always loads a torch pretrain checkpoint;
    this CLI additionally accepts our own Orbax trees):

      torch file          -> key-surgery converter (pretrain text_encoder
                             prefix-strip, SPMM_models_rxn.py:16-29);
      Orbax SPMM pretrain -> JAX-native tree loader (same semantics);
      Orbax rxn tree      -> resumed fine-tune params, used as-is.
    """
    if is_torch_checkpoint(path):
        state = load_torch_state_dict(path)
        params = load_encoder_from_pretrain(params, state, encoder_cfg)
        return jax.tree.map(jnp.asarray, params)
    state = restore_checkpoint(path)
    tree = state["params"] if "params" in state else state
    if "text_encoder" in tree:   # SPMM pretrain state (e.g. cli.pretrain's)
        return load_encoder_from_pretrain_tree(params, tree, encoder_cfg)
    return tree


def metric_eval(refs: list[str], cands) -> float:
    """Canonical exact-match accuracy, top-k any-hit
    (reference d_rxn_prediction.py:126-145)."""
    correct = 0
    for r, c in zip(refs, cands):
        rc = canonicalize(r)
        if rc is None:
            continue
        cs = [c] if isinstance(c, str) else c
        for cand in cs:
            if canonicalize(cand) == rc:
                correct += 1
                break
    return correct / max(len(refs), 1)


def evaluate(params, tok, dataset, n_beam: int, batch_size: int, mesh=None):
    sources = []
    refs = []
    for i in range(len(dataset)):
        src, tgt = dataset[i]
        sources.append(src.replace("[CLS]", ""))
        refs.append(tgt.replace("[CLS]", ""))
    if n_beam == 1:
        cands = predict_greedy(params, tok, sources, batch_size=batch_size,
                               mesh=mesh)
    else:
        # batched beam kernel decodes the whole batch in one program — no
        # reason to inherit the reference's batch-1 beam eval
        # (d_rxn_prediction.py:85-123)
        cands = predict_beam(params, tok, sources, k=n_beam,
                             batch_size=batch_size, mesh=mesh)
    return metric_eval(refs, cands)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", default="./output/RXN")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mode", default="forward", choices=["forward", "retro"])
    p.add_argument("--data_dir", default="./data/6_RXNprediction")
    p.add_argument("--evaluate", action="store_true")
    p.add_argument("--n_beam", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--min_lr", type=float, default=5e-6)
    p.add_argument("--epoch", type=int, default=300)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--batch_size_eval", type=int, default=32,
                   help="decode batch for greedy AND beam eval (the "
                        "reference forces batch 1 for beam; the batched "
                        "beam kernel has no such constraint)")
    p.add_argument("--seed", type=int, default=None)
    add_prng_arg(p)
    args = p.parse_args(argv)

    set_default_prng(args.prng)   # before the first PRNGKey
    seed = seed_everything(args.seed)
    tok = make_tokenizer()
    decoder_cfg, encoder_cfg = text_config(), smiles_config()

    if args.mode == "forward":
        d = f"{args.data_dir}/USPTO-480k"
        train_ds = USPTODataset(f"{d}/train_parsed.txt", augment=True)
        valid_ds = USPTODataset(f"{d}/valid_parsed.txt")
        test_ds = USPTODataset(f"{d}/test_parsed.txt")
    else:
        pkl = f"{args.data_dir}/USPTO-50k/uspto_50.pickle"
        train_ds = USPTORetroDataset(pkl, "train", augment=True)
        valid_ds = USPTORetroDataset(pkl, "test")
        test_ds = USPTORetroDataset(pkl, "test")
    print(len(train_ds), len(valid_ds), len(test_ds))

    params = init_rxn_params(jax.random.PRNGKey(seed), decoder_cfg,
                             encoder_cfg)
    if args.checkpoint:
        params = load_rxn_checkpoint(params, args.checkpoint, encoder_cfg)

    fcfg = FinetuneConfig(lr=args.lr, min_lr=args.min_lr, epochs=args.epoch,
                          batch_size_train=args.batch_size,
                          warmup_epochs=1, step_size=100)
    steps_per_epoch = max(len(train_ds) // args.batch_size, 1)
    # donate: the loop reassigns (params, opt_state) every step and only the
    # latest params are evaluated/saved — see make_downstream_step's contract
    tx, step = make_rxn_step(fcfg, steps_per_epoch, decoder_cfg, encoder_cfg,
                             donate=True)
    opt_state = tx.init(params)

    mesh = auto_mesh()                 # all visible chips, no flag needed
    eval_bs = args.batch_size_eval
    if mesh is not None:
        eval_bs += -eval_bs % mesh.devices.size
        print(f"eval data-parallel over {mesh.devices.size} devices "
              f"(batch {eval_bs})")
    best_valid, best_test = 0.0, 0.0
    global_step = 0
    t0 = time.time()
    os.makedirs(args.output_dir, exist_ok=True)
    logger = MetricLogger(os.path.join(args.output_dir, "metrics.jsonl"))
    epochs_out = []
    try:
        for epoch in range(args.epoch):
            if not args.evaluate:
                print("TRAIN", epoch)
                for b in prefetch(batch_pairs(tok, train_ds, args.batch_size,
                                              shuffle=True,
                                              seed=seed + epoch)):
                    params, opt_state, metrics = step(
                        params, opt_state, jnp.int32(global_step),
                        {k: jnp.asarray(v) for k, v in b.items()
                         if k != "n_real"},
                        jax.random.fold_in(jax.random.PRNGKey(seed),
                                           global_step))
                    global_step += 1
                    logger.log(global_step, {"loss": metrics["loss"],
                                             "lr": metrics["lr"]})
            print("VALIDATION")
            val = evaluate(params, tok, valid_ds, args.n_beam, eval_bs, mesh)
            print("Accuracy:", val)
            print("TEST")
            tst = evaluate(params, tok, test_ds, args.n_beam, eval_bs, mesh)
            print("Accuracy:", tst)
            epochs_out.append({"epoch": epoch, "valid_acc": val,
                               "test_acc": tst})
            if not args.evaluate and val >= best_valid:
                print("SAVING...", tst)
                save_checkpoint(os.path.join(args.output_dir,
                                             "checkpoint_best"),
                                {"params": params})
                best_valid, best_test = val, tst
            if args.evaluate:
                break
    finally:
        logger.close()
    print(f"Training time {time.time() - t0:.1f}s")
    print("test ACC of checkpoint with best val ACC:", best_test)
    # machine-readable outcome for evidence runners / scripting
    with open(os.path.join(args.output_dir, "result.json"), "w") as f:
        json.dump({"best_valid_acc": best_valid, "best_test_acc": best_test,
                   "epochs": epochs_out, "steps": global_step,
                   "n_beam": args.n_beam, "mode": args.mode}, f, indent=1)


if __name__ == "__main__":
    main()
