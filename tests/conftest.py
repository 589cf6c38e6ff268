"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI, so sharding/pjit logic is
exercised on XLA's host-platform device emulation.  Must run before JAX
initializes its backends, hence the env mutation at import time.
"""

import os

_platform = os.environ.get("FACT_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU backend at interpreter
# start with JAX_PLATFORMS=axon; the env var alone doesn't win, the config
# update does.
jax.config.update("jax_platforms", _platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: e2e trainings, learning-dynamics recipes and interpret-mode "
        "kernel sweeps (minutes each on the 1-CPU box).  The inner-loop "
        'gate is `pytest -m "not slow"` (<5 min); run the full suite '
        "before landing kernel or training-path changes.",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
