"""LR schedule parity vs the reference timm CosineLRScheduler driven with the
reference's exact step cadence (SPMM_models.py:372-378, d_classification.py:73-74,177).

The reference fires scheduler.step at the END of boundary batches, so the new
lr takes effect one batch later than our closed-form t(step); we compare at
every off-boundary step (the one-batch shift at each of the ~20 chunk
boundaries is a documented simplification).
"""

import numpy as np
import pytest

from spmm_tpu.training.schedules import reference_cosine_schedule

from conftest import requires_reference


def run_reference_lr_trace(torch, base_lr, min_lr, warmup_lr, epochs,
                           warmup_epochs, steps_per_epoch, step_size):
    """lr active DURING each global step, stepping the scheduler exactly like
    the reference loops (at end of boundary batches / epoch starts)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from scheduler import create_scheduler

    class AttrDict(dict):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self.__dict__ = self

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    sched, _ = create_scheduler(AttrDict({
        "sched": "cosine", "lr": base_lr, "epochs": epochs,
        "min_lr": min_lr, "decay_rate": 1, "warmup_lr": warmup_lr,
        "warmup_epochs": warmup_epochs, "cooldown_epochs": 0,
    }), opt)

    lrs = []
    warmup_iterations = warmup_epochs * step_size
    for epoch in range(epochs):
        for i in range(steps_per_epoch):
            # pretrain cadence (SPMM_models.py:372-378): epoch>0 fires at
            # batch 0; epoch 0 fires at chunk boundaries.  Both at step END.
            lrs.append(opt.param_groups[0]["lr"])
            if epoch > 0 and i == 0:
                sched.step(epoch + warmup_epochs)
            elif epoch == 0 and i % step_size == 0 and i <= warmup_iterations:
                sched.step(i // step_size)
    return np.array(lrs)


@requires_reference
@pytest.mark.parametrize("base,mn,warm,epochs,warm_ep,spe,ss", [
    (5e-5, 1e-5, 5e-5, 6, 2, 250, 100),
    (3e-5, 5e-6, 0.5e-5, 5, 1, 120, 50),
    (5e-5, 3e-6, 0.5e-5, 4, 1, 250, 100),
])
def test_schedule_matches_reference(base, mn, warm, epochs, warm_ep, spe, ss):
    import torch

    want = run_reference_lr_trace(torch, base, mn, warm, epochs, warm_ep,
                                  spe, ss)
    sched = reference_cosine_schedule(base, mn, warm, epochs, warm_ep, spe, ss)
    for step in range(epochs * spe):
        epoch, b = divmod(step, spe)
        boundary = (epoch > 0 and b == 0) or (epoch == 0 and b % ss == 0)
        if boundary:
            continue  # reference applies the step's new lr one batch later
        np.testing.assert_allclose(
            float(sched(step)), want[step], rtol=1e-6,
            err_msg=f"step {step} (epoch {epoch}, batch {b})")
