"""Test configuration: force an 8-device virtual CPU platform.

The axon TPU plugin self-registers via sitecustomize and overrides
``JAX_PLATFORMS`` from the environment, so the env var alone is not
enough — we must also update jax.config after import (before any
backend initializes).  Multi-chip sharding tests then run on the
simulated 8-device CPU mesh and numeric tests get deterministic
float32 math.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
