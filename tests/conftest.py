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

# Persistent compile cache: the tiny-model end-to-end tests are dominated by
# XLA:CPU compile time; cache across runs so re-runs are seconds, not minutes.
# setup_compile_cache also disables tracebacks-in-locations, so editing a
# TEST file no longer re-keys (and recompiles) the programs it builds —
# see utils/compile_cache.py for the measured failure mode.
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
from motionclone_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache(min_compile_seconds=2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run slow production-shape tests (minutes on CPU)",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: production-shape tests (minutes on CPU); "
        "enable with --runslow or RUN_SLOW=1",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="needs --runslow or RUN_SLOW=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
