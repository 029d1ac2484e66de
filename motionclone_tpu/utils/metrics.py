"""Output-parity metrics: PSNR and SSIM over frames and videos.

BASELINE.md's acceptance criterion for the rebuild is "PSNR/SSIM parity to
the CUDA reference" against its committed sample outputs
(reference generated_videos/, SURVEY §4 "visual oracle") — the reference
repo itself ships no metric harness, so this module is additive.

SSIM follows Wang et al. 2004 exactly: 11x11 Gaussian window sigma=1.5,
K1=0.01, K2=0.03, population (window-weighted) covariance.  Pure
numpy/scipy — runs on the host, no accelerator involvement.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter


def psnr(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB; ``inf`` for identical inputs."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(data_range**2 / mse))


_SIGMA = 1.5
_TRUNCATE = 3.5  # radius = int(3.5 * 1.5 + 0.5) = 5 -> 11x11 window


def _filt(x: np.ndarray) -> np.ndarray:
    return gaussian_filter(x, sigma=_SIGMA, truncate=_TRUNCATE, mode="reflect")


def ssim(
    a: np.ndarray,
    b: np.ndarray,
    data_range: float = 255.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> float:
    """Mean structural similarity of two images.

    Accepts (H, W) or (H, W, C) arrays; channels are scored independently
    and averaged (the standard RGB treatment).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if a.ndim == 2:
        a, b = a[..., None], b[..., None]
    if a.ndim != 3:
        raise ValueError(f"expected (H, W[, C]), got {a.shape}")

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    scores = []
    for ch in range(a.shape[-1]):
        x, y = a[..., ch], b[..., ch]
        mu_x, mu_y = _filt(x), _filt(y)
        # population moments under the Gaussian window
        var_x = _filt(x * x) - mu_x * mu_x
        var_y = _filt(y * y) - mu_y * mu_y
        cov = _filt(x * y) - mu_x * mu_y
        num = (2 * mu_x * mu_y + c1) * (2 * cov + c2)
        den = (mu_x**2 + mu_y**2 + c1) * (var_x + var_y + c2)
        scores.append(np.mean(num / den))
    return float(np.mean(scores))


def video_metrics(
    frames_a: np.ndarray, frames_b: np.ndarray, data_range: float = 255.0
) -> Dict[str, float]:
    """Per-frame PSNR/SSIM averaged over a clip.

    ``frames_*``: (F, H, W, C) arrays; F must match (the drivers always
    write ``video_length`` frames, t2v_video_sample.py:104).
    """
    if frames_a.shape != frames_b.shape:
        raise ValueError(
            f"shape mismatch: {frames_a.shape} vs {frames_b.shape}"
        )
    psnrs = [psnr(fa, fb, data_range) for fa, fb in zip(frames_a, frames_b)]
    ssims = [ssim(fa, fb, data_range) for fa, fb in zip(frames_a, frames_b)]
    return {
        "psnr_mean": float(np.mean(psnrs)),
        "psnr_min": float(np.min(psnrs)),
        "ssim_mean": float(np.mean(ssims)),
        "ssim_min": float(np.min(ssims)),
        "frames": int(frames_a.shape[0]),
    }


def compare_videos(path_a: str, path_b: str) -> Dict[str, float]:
    """Decode two mp4s and score them (frame counts must match)."""
    from motionclone_tpu.io.video import read_video_frames

    frames_a, _ = read_video_frames(path_a)
    frames_b, _ = read_video_frames(path_b)
    n = min(len(frames_a), len(frames_b))
    if n == 0:
        raise ValueError("empty video")
    return video_metrics(
        np.asarray(frames_a[:n]), np.asarray(frames_b[:n])
    )
