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


# --------------------------------------------------------------------------- #
# full factory family parity: cosine/tanh/step/plateau + lr-noise
# (reference scheduler/scheduler_factory.py:10-87)
# --------------------------------------------------------------------------- #


class AttrDict(dict):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.__dict__ = self


def _ref_factory(torch, argdict):
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from scheduler import create_scheduler

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=argdict["lr"])
    sched, n_epochs = create_scheduler(AttrDict(argdict), opt)
    return sched, n_epochs, opt


BASE_ARGS = {
    "lr": 5e-5, "epochs": 12, "min_lr": 1e-6, "decay_rate": 0.5,
    "warmup_lr": 1e-6, "warmup_epochs": 3, "cooldown_epochs": 0,
    "decay_epochs": 4, "patience_epochs": 2, "seed": 7,
}


@requires_reference
@pytest.mark.parametrize("sched_name", ["cosine", "tanh", "step"])
@pytest.mark.parametrize("noise", [None, 0.5])
def test_factory_epoch_curves_match_reference(sched_name, noise):
    import torch

    from spmm_tpu.training.schedules import create_scheduler as my_factory

    args = dict(BASE_ARGS, sched=sched_name)
    if noise is not None:
        args["lr_noise"] = noise
    ref, ref_epochs, opt = _ref_factory(torch, args)
    mine, my_epochs = my_factory(AttrDict(args))
    assert my_epochs == ref_epochs
    for t in range(args["epochs"]):
        ref.step(t)
        want = opt.param_groups[0]["lr"]
        np.testing.assert_allclose(mine(t), want, rtol=1e-9,
                                   err_msg=f"{sched_name} noise={noise} t={t}")


@requires_reference
def test_factory_plateau_matches_reference():
    """The reference's PlateauLRScheduler wraps torch ReduceLROnPlateau
    (plateau_lr.py:35-44) but passes ``verbose=``, which this image's torch
    removed — the reference class cannot instantiate here.  The oracle is
    therefore the identical ReduceLROnPlateau wiring plus the reference's
    hand-rolled warmup (plateau_lr.py:73-77)."""
    import torch

    from spmm_tpu.training.schedules import create_scheduler as my_factory

    args = dict(BASE_ARGS, sched="plateau", eval_metric="auroc")
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=args["lr"])
    torch_sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, patience=args["patience_epochs"], factor=args["decay_rate"],
        threshold=1e-4, cooldown=0, mode="max", min_lr=args["min_lr"])
    warmup_t = args["warmup_epochs"]
    warmup_step = (args["lr"] - args["warmup_lr"]) / warmup_t

    mine, _ = my_factory(AttrDict(args))
    # a metric trace with improvements and plateaus
    metrics = [0.1, 0.2, 0.3, 0.5, 0.5, 0.5, 0.5, 0.5, 0.6, 0.6, 0.6, 0.6]
    for t, metric in enumerate(metrics):
        if t <= warmup_t:                       # plateau_lr.py:73-77
            want = args["warmup_lr"] + t * warmup_step
            opt.param_groups[0]["lr"] = want
        else:
            torch_sched.step(metric)
            want = opt.param_groups[0]["lr"]
        got = mine.step(t, metric)
        np.testing.assert_allclose(got, want, rtol=1e-9,
                                   err_msg=f"plateau t={t}")
