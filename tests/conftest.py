"""Test config: force an 8-device virtual CPU backend.

Standard JAX fake-backend idiom for multi-chip tests without hardware
(SURVEY §4).  Note: the environment's sitecustomize imports jax at
interpreter start (registering the TPU plugin), so plain env vars are too
late — the platform is re-selected via ``jax.config`` before any backend
initialization, and XLA_FLAGS is set before the first device query.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
