"""Utilities: profiling hooks, metric logging."""

from spmm_tpu.utils.profiling import StepTimer, trace
from spmm_tpu.utils.logging import MetricLogger

__all__ = ["StepTimer", "trace", "MetricLogger"]
