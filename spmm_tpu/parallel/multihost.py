"""Multi-host (pod-slice) execution helpers.

The north-star deployment is a single-host v5e-8 (BASELINE.md), where
``jax.devices()`` sees all 8 chips and the existing dp-mesh code works
unchanged.  On larger pod slices (v5e-16 and up) JAX runs one process per
host: each process sees only its local chips, jitted computations launch
collectively, and each process must feed its own rows of the global batch.
This module is that glue — deliberately thin, because the TPU-native
answer is placement, not new step code:

- :func:`initialize` — `jax.distributed.initialize` wrapper (must run
  before any other JAX call on every process of a multi-host launch; do
  NOT call it for single-process runs — outside a managed cluster there
  is no coordinator to auto-detect and JAX raises);
- :func:`process_rows` — which contiguous rows of the global batch this
  process should load (host-side dataset slicing);
- :func:`host_local_batch` — assemble global batch-sharded ``jax.Array``s
  from each process's local rows via
  ``jax.make_array_from_process_local_data``.

``make_pretrain_step``'s shard_map (training/pretrain.py) sees the same
global mesh and batch sharding whether the arrays were built by one
process or sixteen, so the train step itself is byte-identical.  The
degenerate single-process case must equal a plain ``device_put`` — pinned
in tests/test_multihost.py; the multi-process path follows the documented
JAX contract (one global program, per-process local data).

The reference has no multi-node story at all (single-node DDP over 8
GPUs, reference SPMM_pretrain.py:35-36); beyond-parity capability.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

Params = dict[str, Any]


def initialize(**kwargs) -> None:
    """Start JAX's multi-process runtime (call FIRST, on every process).

    On TPU pods ``jax.distributed.initialize()`` auto-detects the
    coordinator from the TPU metadata, so no arguments are needed; kwargs
    pass through for non-TPU clusters (coordinator_address, num_processes,
    process_id).  Calling after the backend initialized, or twice, raises
    in JAX itself — surfaced as-is, because silently continuing would run
    a pod job as N disconnected single-host jobs.
    """
    jax.distributed.initialize(**kwargs)


def process_rows(n_global: int, process_index: Optional[int] = None,
                 process_count: Optional[int] = None) -> range:
    """Rows of the global batch this process loads (contiguous block).

    Contiguous blocks match the row-major device order of
    ``parallel.mesh.data_parallel_mesh`` built over ``jax.devices()``
    (globally ordered: all of host 0's chips first), so
    ``make_array_from_process_local_data`` never reshuffles rows across
    hosts.
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if n_global % pc:
        raise ValueError(
            f"global batch {n_global} not divisible by {pc} processes")
    per = n_global // pc
    return range(pi * per, (pi + 1) * per)


def host_local_batch(mesh, local_batch: Params) -> Params:
    """Per-process local rows -> global batch-sharded ``jax.Array`` tree.

    ``local_batch`` holds THIS process's rows (``process_rows`` of the
    global batch) for every leaf; the returned tree holds global arrays
    sharded over the mesh's batch axis, ready for the unchanged train
    step.  Single-process this equals
    ``jax.device_put(batch, batch_sharding(mesh))`` exactly.
    """
    from spmm_tpu.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)),
        local_batch)
