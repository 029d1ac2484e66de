"""PSNR/SSIM parity-metric tests (BASELINE.md acceptance harness)."""

import numpy as np
import pytest

from motionclone_tpu.utils.metrics import (
    compare_videos,
    psnr,
    ssim,
    video_metrics,
)


def _img(seed=0, shape=(48, 48, 3)):
    return np.random.default_rng(seed).integers(
        0, 255, size=shape, dtype=np.uint8
    ).astype(np.float64)


def test_psnr_identity_and_closed_form():
    a = _img()
    assert psnr(a, a) == float("inf")
    # uniform offset c: mse = c^2 -> psnr = 20 log10(255 / c)
    c = 5.0
    assert abs(psnr(a, a + c) - 20 * np.log10(255.0 / c)) < 1e-9


def test_psnr_shape_mismatch():
    with pytest.raises(ValueError):
        psnr(np.zeros((4, 4)), np.zeros((5, 4)))


def test_ssim_identity_and_ordering():
    a = _img(1)
    assert abs(ssim(a, a) - 1.0) < 1e-12
    rng = np.random.default_rng(2)
    slightly = a + rng.normal(0, 2, a.shape)
    badly = a + rng.normal(0, 40, a.shape)
    s1, s2 = ssim(a, slightly), ssim(a, badly)
    assert 0 < s2 < s1 < 1
    # structure inversion scores near zero / negative
    assert ssim(a, 255.0 - a) < 0.2


def test_ssim_grayscale_matches_single_channel():
    a, b = _img(3, (32, 32)), _img(4, (32, 32))
    assert abs(ssim(a, b) - ssim(a[..., None], b[..., None])) < 1e-12


def test_ssim_luminance_shift_is_forgiving_vs_noise():
    """A constant luminance shift should hurt far less than equal-power
    noise — the defining property separating SSIM from PSNR."""
    a = _img(5)
    shift = np.clip(a + 10.0, 0, 255)
    noise = np.clip(
        a + np.random.default_rng(6).choice([-10.0, 10.0], a.shape), 0, 255
    )
    assert ssim(a, shift) > ssim(a, noise)
    assert abs(psnr(a, shift) - psnr(a, noise)) < 1.0  # PSNR can't tell


def test_video_metrics_and_compare(tmp_path):
    from motionclone_tpu.io.video import write_video

    rng = np.random.default_rng(7)
    # smooth low-frequency content survives mp4 compression
    base = rng.normal(size=(4, 8, 8, 3))
    frames = np.clip(
        np.kron(base, np.ones((1, 8, 8, 1))) * 40 + 128, 0, 255
    ).astype(np.uint8)
    m = video_metrics(frames.astype(np.float64), frames.astype(np.float64))
    assert m["psnr_mean"] == float("inf") and m["ssim_mean"] == 1.0
    assert m["frames"] == 4

    pa, pb = str(tmp_path / "a.mp4"), str(tmp_path / "b.mp4")
    write_video(pa, frames, fps=8)
    write_video(pb, frames, fps=8)
    got = compare_videos(pa, pb)
    # identical encodes decode identically -> near-perfect scores
    assert got["psnr_mean"] > 45 or got["psnr_mean"] == float("inf")
    assert got["ssim_mean"] > 0.98
    assert got["frames"] == 4
