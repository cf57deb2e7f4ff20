"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

This is the TPU-native answer to multi-device testing without a cluster: the
same pjit/shard_map code paths run identically over 8 fake CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) and over a real TPU pod
slice (SURVEY.md §4c).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
