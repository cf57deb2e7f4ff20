"""Shared MoleculeNet fine-tune driver (classification / multilabel /
regression), mirroring the reference training loops
(d_classification.py:106-183, d_regression.py:105-197,
d_classification_multilabel.py)."""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from spmm_tpu.configs import FinetuneConfig, text_config
from spmm_tpu.checkpoint.convert import load_torch_state_dict
from spmm_tpu.checkpoint.io import is_torch_checkpoint, restore_checkpoint
from spmm_tpu.data.pipeline import batch_supervised, prefetch
from spmm_tpu.models.downstream import (
    downstream_forward, init_downstream_params, load_encoder_from_pretrain,
)
from spmm_tpu.training.finetune import make_downstream_step
from spmm_tpu.tokenizer import SmilesTokenizer


def evaluate_scores(params, cfg, tok, dataset, task, batch_size=64):
    """Collect predictions over an eval set (deterministic).

    NO truncation at eval — the reference evaluates with padding='longest'
    and no max_length (d_classification.py:86); position embeddings bound
    sequences at 512 like the reference."""
    forward = jax.jit(
        lambda p, ids, mask: downstream_forward(p, cfg, ids, mask))
    preds, targets = [], []
    for b in batch_supervised(tok, dataset.texts, dataset.targets,
                              batch_size, truncation=False, pad_batch=True):
        out = np.asarray(forward(params, jnp.asarray(b["ids"]),
                                 jnp.asarray(b["mask"])))[: b["n_real"]]
        preds.append(out)
        targets.append(np.asarray(b["target"])[: b["n_real"]])
    return np.concatenate(preds), np.concatenate(targets)


def eval_metric(params, cfg, tok, dataset, task, extended: bool = False,
                batch_size: int = 64):
    """``extended`` also prints Acc/SP/SE for binary tasks — the DILI metrics
    whose gate in the reference can never fire (d_classification.py:99-101,
    isinstance check against the wrong type)."""
    from sklearn.metrics import accuracy_score, recall_score, roc_auc_score

    preds, targets = evaluate_scores(params, cfg, tok, dataset, task,
                                     batch_size=batch_size)
    if task == "classification":
        scores = np.exp(preds[:, 1]) / np.exp(preds).sum(axis=1)
        if extended:
            hard = (scores > 0.5).astype(np.int32)
            print(f"Acc: {accuracy_score(targets, hard):.4f}, "
                  f"SP: {recall_score(targets, hard, pos_label=0):.4f}, "
                  f"SE: {recall_score(targets, hard):.4f}, "
                  f"AUROC: {roc_auc_score(targets, scores):.4f}")
        return float(roc_auc_score(targets, scores))
    if task == "multilabel":
        scores = 1.0 / (1.0 + np.exp(-preds))
        return float(roc_auc_score(targets, scores))
    # regression: denormalized RMSE (both sides de-normalized with the train
    # stats regardless of whether targets were normalized — the reference
    # asymmetry, d_regression.py:96-102)
    p = preds[:, 0] * dataset.value_std + dataset.value_mean
    t = targets * dataset.value_std + dataset.value_mean
    return float(np.sqrt(np.mean((p - t) ** 2)))


def run_finetune(
    task: str,
    train_ds,
    valid_ds,
    test_ds,
    fcfg: FinetuneConfig,
    checkpoint: Optional[str],
    seed: int,
    n_output: int = 2,
    extended_metrics: bool = False,
    cfg=None,
    output_dir: Optional[str] = None,
):
    """``output_dir`` (optional) additionally records per-step loss
    (metrics.jsonl) and the best-val outcome (result.json) — the
    machine-readable counterpart of the reference's console prints
    (d_classification.py:139-151)."""
    import json
    import os

    from spmm_tpu.utils.logging import MetricLogger

    cfg = cfg or text_config()
    tok = SmilesTokenizer()
    params = init_downstream_params(jax.random.PRNGKey(seed), task, cfg,
                                    n_output)
    if checkpoint:
        print("LOADING PRETRAINED MODEL..")
        if is_torch_checkpoint(checkpoint):
            state = load_torch_state_dict(checkpoint)
            params = load_encoder_from_pretrain(params, state, cfg)
            params = jax.tree.map(jnp.asarray, params)
        else:
            full = restore_checkpoint(checkpoint)
            src = full["params"] if "params" in full else full
            from spmm_tpu.models.downstream import truncated_text_config

            tcfg = truncated_text_config(cfg)
            enc = {
                "embeddings": src["text_encoder"]["bert"]["embeddings"],
                "layers": src["text_encoder"]["bert"]["layers"][: tcfg.num_hidden_layers],
            }
            params = {**params, "encoder": enc}

    steps_per_epoch = max(len(train_ds) // fcfg.batch_size_train, 1)
    # donate: the loop reassigns (params, opt_state) every step and eval only
    # ever reads the latest params — see make_downstream_step's contract
    tx, step = make_downstream_step(task, fcfg, steps_per_epoch, cfg,
                                    donate=True)
    opt_state = tx.init(params)

    higher_better = task != "regression"
    best_valid = -np.inf if higher_better else np.inf
    best_test = 0.0
    global_step = 0
    t0 = time.time()
    logger = None
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        logger = MetricLogger(os.path.join(output_dir, "metrics.jsonl"))
    epochs_out = []
    try:
        for epoch in range(fcfg.epochs):
            print("TRAIN", epoch)
            batches = prefetch(batch_supervised(
                tok, train_ds.texts, train_ds.targets, fcfg.batch_size_train,
                shuffle=True, seed=seed + epoch, drop_last=True))
            for b in batches:
                tgt = jnp.asarray(b["target"])
                if task == "classification":
                    tgt = tgt.astype(jnp.int32)
                params, opt_state, metrics = step(
                    params, opt_state, jnp.int32(global_step),
                    {"ids": jnp.asarray(b["ids"]),
                     "mask": jnp.asarray(b["mask"]), "target": tgt},
                    jax.random.fold_in(jax.random.PRNGKey(seed), global_step))
                global_step += 1
                if logger:
                    logger.log(global_step, {"loss": metrics["loss"],
                                             "lr": metrics["lr"]})
            val = eval_metric(params, cfg, tok, valid_ds, task,
                              batch_size=fcfg.batch_size_test)
            tst = eval_metric(params, cfg, tok, test_ds, task,
                              extended=extended_metrics,
                              batch_size=fcfg.batch_size_test)
            print(f"VALID: {val:.4f}  TEST: {tst:.4f}")
            epochs_out.append({"epoch": epoch, "valid": val, "test": tst})
            if (higher_better and val >= best_valid) or \
               (not higher_better and val < best_valid):
                best_valid, best_test = val, tst
    finally:
        if logger:
            logger.close()
    print(f"Training time {time.time() - t0:.1f}s")
    print("Test metric of the checkpoint with best validation:", best_test)
    if output_dir:
        with open(os.path.join(output_dir, "result.json"), "w") as f:
            json.dump({"task": task, "best_valid": best_valid,
                       "best_test": best_test, "epochs": epochs_out,
                       "steps": global_step}, f, indent=1)
    return best_test
