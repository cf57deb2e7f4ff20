"""Multi-host glue (parallel/multihost.py): row slicing must partition the
global batch exactly, and the single-process degenerate case of
host_local_batch must equal a plain device_put — same values, same
sharding, usable by the sharded train-step machinery unchanged.

(True multi-process execution follows the documented JAX contract and
needs real multiple hosts; the reference has no multi-node story at all —
single-node DDP, SURVEY §2.3.)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from spmm_tpu.parallel.mesh import batch_sharding, data_parallel_mesh
from spmm_tpu.parallel.multihost import host_local_batch, process_rows


def test_process_rows_partition_exact():
    pc, n = 4, 32
    rows = [process_rows(n, process_index=i, process_count=pc)
            for i in range(pc)]
    flat = [r for rng in rows for r in rng]
    assert flat == list(range(n))            # disjoint, ordered, complete
    assert all(len(r) == n // pc for r in rows)


def test_process_rows_requires_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        process_rows(10, process_index=0, process_count=4)


def test_process_rows_defaults_to_runtime():
    # single-process runtime: every row belongs to this process
    assert list(process_rows(8)) == list(range(8))


def test_host_local_batch_single_process_equals_device_put():
    mesh = data_parallel_mesh(8)
    rng = np.random.default_rng(0)
    batch = {
        "prop": rng.normal(size=(8, 53)).astype(np.float32),
        "ids": rng.integers(4, 300, size=(8, 16)).astype(np.int32),
    }
    got = host_local_batch(mesh, batch)
    want = jax.device_put(batch, batch_sharding(mesh))
    for key in batch:
        assert got[key].sharding == want[key].sharding
        np.testing.assert_array_equal(np.asarray(got[key]),
                                      np.asarray(want[key]))

    # and the assembled arrays drive sharded computation like any other
    from jax.sharding import PartitionSpec as P

    out = jax.jit(
        jax.shard_map(lambda x: jax.lax.psum(jnp.sum(x), "dp"),
                      mesh=mesh, in_specs=P("dp"), out_specs=P()))(
        got["prop"])
    np.testing.assert_allclose(float(out), batch["prop"].sum(), rtol=1e-6)
