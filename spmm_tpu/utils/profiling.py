"""Profiling hooks (SURVEY §5.1: the reference has only tqdm + wallclock
prints; this is the TPU-native upgrade).

``trace`` wraps a block in a jax.profiler trace (viewable in TensorBoard /
Perfetto); ``StepTimer`` measures steady-state step time and throughput with
device synchronization.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


# bf16 peak per chip, for MFU reporting (TPU v5e: 197 TFLOP/s)
PEAK_BF16_FLOPS_PER_CHIP = 197e12


def compiled_flops(compiled) -> Optional[float]:
    """Total flops of a jax.stages.Compiled step from XLA's cost analysis
    (None when the backend doesn't expose it)."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else None
        if cost and "flops" in cost:
            return float(cost["flops"])
    except Exception:
        pass
    return None


def mfu(flops_per_step: Optional[float], step_time_s: float,
        n_chips: int = 1,
        peak_per_chip: float = PEAK_BF16_FLOPS_PER_CHIP) -> Optional[float]:
    """Model FLOPs utilization of a measured step (None if flops unknown)."""
    if not flops_per_step or not step_time_s or step_time_s <= 0:
        return None
    return flops_per_step / step_time_s / (n_chips * peak_per_chip)


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: with trace('/tmp/prof'): step(...)"""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wallclock per-step timing with warmup exclusion.

    timer = StepTimer(warmup=2)
    for batch in data:
        out = step(...)
        timer.tick(out)          # blocks on `out` before timestamping
    print(timer.mean_step_time, timer.throughput(global_batch))
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steps(self) -> int:
        return max(len(self._times) - self.warmup, 0)

    @property
    def mean_step_time(self) -> float:
        if not self.steps:
            return float("nan")
        return sum(self._times[self.warmup:]) / self.steps

    def throughput(self, items_per_step: int) -> float:
        return items_per_step / self.mean_step_time
