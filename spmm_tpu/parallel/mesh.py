"""Mesh construction and sharding specs.

The reference scales with PyTorch-Lightning DDP over 8 GPUs/NCCL (reference
SPMM_pretrain.py:35-36).  The TPU-native equivalent is a 1-D data-parallel
``jax.sharding.Mesh`` over ICI: params/EMA/queues replicated, batches sharded
on axis ``dp``, gradients reduced by ``psum`` inside ``shard_map`` (SURVEY
§2.3/§5.8).  The mesh helper leaves room for more axes (tp/pp) even though
this ~110M-param model family doesn't need them.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def data_parallel_mesh(n_devices: Optional[int] = None,
                       devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DP_AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))


def auto_mesh() -> Optional[Mesh]:
    """Data-parallel mesh over every visible device, or None on one device.

    Inference CLIs call this so a v5e-8 is picked up with no flag (the north
    star throughput is per v5e-8, BASELINE.md) while single-chip runs keep
    the unsharded fast path.  The reference has no multi-device inference at
    all (every d_*.py runs 1 GPU, SURVEY §6).
    """
    devices = jax.devices()
    if len(devices) <= 1:
        return None
    return data_parallel_mesh(devices=devices)
