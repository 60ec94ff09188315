"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; tests are
deterministic CPU runs so the sharding path is validated without hardware
(SURVEY.md §4.7: the reference has no multi-node test story — we add one).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"   # tests always run on the CPU backend
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize registers the axon TPU backend and pins
# jax_platforms=axon at import time; env alone doesn't win — override the
# live config before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

CAPTURE = "/root/reference/kernel/test-data/fsample-6.dmp"


@pytest.fixture(scope="session")
def capture_20msps() -> np.ndarray:
    """The golden 6 Mbps capture, DC-removed, decimated to 20 Msps."""
    from sora_tpu.io.dumpfile import load_dump

    x = load_dump(CAPTURE).astype(np.complex128)
    x -= x.mean()
    return x[0::2]


@pytest.fixture()
def rng() -> np.random.Generator:
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order
    return np.random.default_rng(0x50BA)
