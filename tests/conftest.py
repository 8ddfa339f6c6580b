"""Test harness: force the CPU backend with 8 virtual devices.

The axon sitecustomize registers a TPU backend and sets
jax_platforms="axon,cpu"; tests run on CPU (f64 golden math, virtual
8-device meshes for the distributed paths), so re-point the config before
any test imports module code.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
