"""LR schedules replicating the reference's timm-cosine + warmup-chunk cadence.

The reference drives a timm ``CosineLRScheduler`` (reference
scheduler/cosine_lr.py:69-96) with an unusual cadence (SURVEY §3.1):

  - during epoch 0, ``scheduler.step(batch_idx // step_size)`` every
    ``step_size`` batches while ``batch_idx <= warmup_epochs * step_size``
    (step_size is 100 for pretrain/regression/rxn, 50 for classification);
  - from epoch 1 on, one ``scheduler.step(epoch + warmup_epochs)`` per epoch
    (pretrain steps at epoch start — SPMM_models.py:374-378; fine-tunes step
    ``epoch + warmup_epochs + 1`` at epoch END — d_classification.py:177 —
    which lands on the same t during the epoch).

Net effect, expressed directly as a function of the global step:

  t(step) = min(batch_idx // step_size, warmup_epochs)   if epoch == 0
          = epoch + warmup_epochs                        otherwise
  lr(t)   = warmup_lr + t * (base_lr - warmup_lr) / warmup_epochs   (t < warmup)
          = min_lr + 0.5*(base_lr - min_lr)*(1 + cos(pi * (t - warmup)/epochs))
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_cosine_schedule(
    base_lr: float,
    min_lr: float,
    warmup_lr: float,
    epochs: int,
    warmup_epochs: int,
    steps_per_epoch: int,
    step_size: int = 100,
):
    """Returns lr(global_step) implementing the cadence above."""

    def schedule(global_step):
        global_step = jnp.asarray(global_step)
        epoch = global_step // steps_per_epoch
        batch_idx = global_step % steps_per_epoch
        t_warm = jnp.minimum(batch_idx // step_size, warmup_epochs)
        t = jnp.where(epoch == 0, t_warm, epoch + warmup_epochs)

        if warmup_epochs > 0:
            warm = warmup_lr + t * (base_lr - warmup_lr) / warmup_epochs
        else:
            warm = jnp.full_like(t, base_lr, dtype=jnp.float32)
        t_cos = jnp.maximum(t - warmup_epochs, 0)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * t_cos / epochs))
        return jnp.where(t < warmup_epochs, warm, cos).astype(jnp.float32)

    return schedule
