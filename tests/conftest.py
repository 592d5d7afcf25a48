"""Test configuration.

Tests run on a virtual 8-device CPU mesh (the multi-chip sharding story is
validated without TPU hardware) with x64 enabled so manifold-op parity
against the reference (precision-of-record float64, reference
tuning_fft.sh:34) can be asserted tightly.

NOTE: this image pre-imports jax at interpreter start (sitecustomize), so
JAX_PLATFORMS set here via os.environ is too late; jax.config.update works
because backends initialize lazily.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
