"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes its backends. Real-TPU benchmarks
live in bench.py, not the test suite.
"""

import os

# NOTE: this box exports JAX_PLATFORMS=axon and the plugin force-prepends
# itself, so the env var alone is NOT enough — the config update below is
# what actually pins tests to CPU. E2FGVI_TEST_TPU=1 lifts the pin for the
# TPU-gated serving fast-path tests (tests/test_fastpath_tpu.py).
_USE_TPU = bool(os.environ.get("E2FGVI_TEST_TPU"))
if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    prev = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in prev:
        os.environ["XLA_FLAGS"] = (
            prev + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

from e2fgvi_tpu.utils import env  # noqa: E402

env.setup()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
