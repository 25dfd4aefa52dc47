"""Test harness config: run everything on a virtual 8-device CPU mesh.

The ambient environment pins JAX to the tunneled TPU (axon plugin registered
by sitecustomize at interpreter start), so the env-var route is too late;
`jax.config.update` still wins as long as no backend has been initialized.
"""

import os

# Request 8 virtual CPU devices before the CPU client is created.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", os.environ.get("FHE_TPU_TEST_PLATFORM", "cpu"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
