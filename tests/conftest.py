"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This is the TPU-native answer to multi-device testing without a cluster: the
same pjit/shard_map code paths run identically over 8 fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and over a real TPU pod
slice (SURVEY.md §4c).
"""

import os

# force CPU even when the session env pins JAX_PLATFORMS=axon (real TPU):
# tests must be hermetic and run on the 8-device virtual mesh.  The axon
# plugin wins over the env var, so use the config API, which does override.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compilation cache: the suite's multi-device XLA-CPU train-step
# compiles dominate its wall time and are identical run-to-run; entries are
# keyed on HLO + backend/topology so they never collide with TPU runs
from spmm_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (heavy 8-device XLA-CPU compiles "
             "of full train-step graphs; several minutes each)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip_slow = pytest.mark.skip(
        reason="slow: heavy multi-device compile (pass --runslow)")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)


REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


def has_torch() -> bool:
    try:
        import torch  # noqa: F401
        return True
    except ImportError:
        return False


requires_reference = pytest.mark.skipif(
    not (has_reference() and has_torch()),
    reason="reference repo + torch needed for golden-parity tests",
)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
