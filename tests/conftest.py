"""Test harness config: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding/collective tests
run against XLA's host-platform device emulation instead. Must run before
jax initializes, hence env vars at conftest import time.

Set CADX_TEST_TPU=1 to run on the real TPU instead (single device —
mesh-dependent tests will skip/fail; useful for exercising the COMPILED
Pallas kernel paths, e.g. `CADX_TEST_TPU=1 pytest tests/test_kernels.py`).
"""

import os

_USE_TPU = os.environ.get("CADX_TEST_TPU") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import re as _re

    # FORCE 8 devices: a pre-existing count flag (e.g. a driver's =2)
    # would break every 8-way mesh test, so replace rather than keep it
    flags = _re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                    os.environ.get("XLA_FLAGS", ""))
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

    # The container's sitecustomize imports jax before conftest runs, so
    # the env var alone is too late — force the platform through the live
    # config (backends initialize lazily, so this still takes effect).
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
