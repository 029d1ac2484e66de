"""Native hostops vs the pure-numpy reference implementations."""

import numpy as np
import pytest

from motionclone_tpu.io import hostops
from motionclone_tpu.io.video import resize_bilinear_align_corners


def test_native_builds():
    assert hostops.available(), "native hostops failed to build/load"


@pytest.mark.skipif(not hostops.available(), reason="native lib unavailable")
def test_resize_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 37, 53, 3), dtype=np.uint8)
    native = hostops.resize_normalize_u8(frames, 64, 48, 1.0 / 127.5, -1.0)
    ref = resize_bilinear_align_corners(frames.astype(np.float32), 64, 48)
    ref = ref / np.float32(127.5) - 1.0
    np.testing.assert_allclose(native, ref, atol=2e-5)


@pytest.mark.skipif(not hostops.available(), reason="native lib unavailable")
def test_resize_identity_passthrough():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    native = hostops.resize_normalize_u8(frames, 16, 16, 1.0, 0.0)
    np.testing.assert_allclose(native, frames.astype(np.float32), atol=1e-6)


def test_to_uint8_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.uniform(-0.1, 1.1, size=(2, 33, 17, 3)).astype(np.float32)
    out = hostops.to_uint8(x)
    ref = np.clip(np.rint(x * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)
