"""Fine-tuning train/eval loops for MoleculeNet and reaction prediction.

Mirrors the reference drivers (d_classification.py:52-103, d_regression.py:
52-102, d_classification_multilabel.py:50-91, d_rxn_prediction.py:27-52):
AdamW(wd=0.02) over all params, no grad clipping, reference cosine schedule
with epoch-0 warmup chunks (step_size 50 for classification, 100 for
regression/rxn), best-validation model selection.

TPU-first: one jitted train step per (task, bucket-shape); batches arrive
pre-tokenized and bucket-padded from the host pipeline.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from spmm_tpu.configs import BertArchConfig, FinetuneConfig, text_config
from spmm_tpu.models.downstream import downstream_forward, downstream_loss
from spmm_tpu.models.rxn import rxn_loss
from spmm_tpu.training.schedules import reference_cosine_schedule

Params = dict[str, Any]


def make_finetune_optimizer(fcfg: FinetuneConfig):
    def opt(learning_rate):
        return optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                           weight_decay=fcfg.weight_decay)

    # concrete f32 initial value: keeps the opt-state pytree identical
    # across steps (a python-float init recompiles the step once the
    # schedule writes a non-weak array into hyperparams)
    return optax.inject_hyperparams(opt)(
        learning_rate=jnp.asarray(0.0, jnp.float32))


def make_downstream_step(
    task: str,
    fcfg: FinetuneConfig,
    steps_per_epoch: int,
    cfg: Optional[BertArchConfig] = None,
    donate: bool = False,
):
    """``donate=True`` donates (params, opt_state): train loops that
    reassign both every step should enable it — it halves the train-state
    HBM and, on remote runtimes that charge a round-trip per newly
    allocated output buffer (axon: ~0.4 s/leaf on the first two
    dispatches), removes the startup allocation storm.  The caller must
    not reuse a pre-step params/opt_state reference afterwards."""
    cfg = cfg or text_config()
    tx = make_finetune_optimizer(fcfg)
    schedule = reference_cosine_schedule(
        fcfg.lr, fcfg.min_lr, fcfg.warmup_lr, fcfg.epochs,
        fcfg.warmup_epochs, steps_per_epoch, step_size=fcfg.step_size)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, global_step, batch, rng):
        lr = schedule(global_step)
        loss, grads = jax.value_and_grad(downstream_loss)(
            params, cfg, task, batch["ids"], batch["mask"], batch["target"],
            rng)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "lr": lr}

    return tx, step


def make_rxn_step(
    fcfg: FinetuneConfig,
    steps_per_epoch: int,
    decoder_cfg: Optional[BertArchConfig] = None,
    encoder_cfg: Optional[BertArchConfig] = None,
    donate: bool = False,
):
    """``donate`` as in :func:`make_downstream_step`."""
    from spmm_tpu.configs import smiles_config

    decoder_cfg = decoder_cfg or text_config()
    encoder_cfg = encoder_cfg or smiles_config()
    tx = make_finetune_optimizer(fcfg)
    schedule = reference_cosine_schedule(
        fcfg.lr, fcfg.min_lr, fcfg.warmup_lr, fcfg.epochs,
        fcfg.warmup_epochs, steps_per_epoch, step_size=fcfg.step_size)

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(params, opt_state, global_step, batch, rng):
        lr = schedule(global_step)
        loss, grads = jax.value_and_grad(rxn_loss)(
            params, decoder_cfg, encoder_cfg,
            batch["src_ids"], batch["src_mask"],
            batch["tgt_ids"], batch["tgt_mask"], rng=rng,
            deterministic=False)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "lr": lr}

    return tx, step


# --------------------------------------------------------------------------- #
# metrics (reference metric harnesses, SURVEY §6)
# --------------------------------------------------------------------------- #


def auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Binary AUROC (reference uses sklearn.roc_auc_score,
    d_classification.py:103)."""
    from sklearn.metrics import roc_auc_score

    return float(roc_auc_score(labels, scores))


def macro_auroc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Macro AUROC over label columns (d_classification_multilabel.py:91):
    the explicit per-column mean of binary AUROCs (sklearn's default
    ``average='macro'`` on 2-D input computes exactly this; spelled out here
    so single-column degenerate label sets fail loudly per column)."""
    from sklearn.metrics import roc_auc_score

    labels = np.asarray(labels)
    if labels.ndim == 1:
        return auroc(labels, scores)
    cols = [float(roc_auc_score(labels[:, j], np.asarray(scores)[:, j]))
            for j in range(labels.shape[1])]
    return float(np.mean(cols))


def rmse(preds: np.ndarray, targets: np.ndarray,
         mean: float = 0.0, std: float = 1.0) -> float:
    """Denormalized RMSE (reference d_regression.py:96-102 de-normalizes BOTH
    sides with the train-set stats even for datasets whose targets were never
    normalized — the asymmetry is replicated by the caller's dataset flags)."""
    p = preds * std + mean
    t = targets * std + mean
    return float(np.sqrt(np.mean(np.square(p - t))))


def classification_scores(
    params: Params,
    cfg: BertArchConfig,
    batches,
) -> tuple[np.ndarray, np.ndarray]:
    """Softmax positive-class scores + labels over an eval set."""
    scores, labels = [], []
    forward = jax.jit(partial(downstream_forward, deterministic=True),
                      static_argnames=("cfg",))
    for batch in batches:
        out = forward(params, cfg, input_ids=batch["ids"],
                      attention_mask=batch["mask"])
        scores.append(np.asarray(jax.nn.softmax(out, axis=-1)[:, 1]))
        labels.append(np.asarray(batch["target"]))
    return np.concatenate(labels), np.concatenate(scores)
