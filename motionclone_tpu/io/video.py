"""Host-side video decode / preprocess / encode.

Replaces the reference's decord (C++ ffmpeg wrapper) + torch path
(util.py:217-242 ``video_preprocess``): OpenCV's native ffmpeg decoder does
the bitstream work, frame sampling and the align-corners bilinear resize are
reproduced exactly, and output stays a numpy array ready for device upload.
This is deliberately off-accelerator in both designs (SURVEY §2.4).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import cv2
import numpy as np


def read_video_frames(path: str) -> Tuple[np.ndarray, float]:
    """Decode all frames as RGB uint8 (N, H, W, 3); returns (frames, fps)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise IOError(f"cannot open video: {path}")
    fps = cap.get(cv2.CAP_PROP_FPS) or 0.0
    frames = []
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        raise IOError(f"no frames decoded from: {path}")
    return np.stack(frames), fps


def sample_indices(total_frames: int, video_length: int) -> np.ndarray:
    """linspace frame sampling (util.py:230)."""
    return np.linspace(0, total_frames - 1, video_length).astype(np.int64)


def resize_bilinear_align_corners(
    frames: np.ndarray, height: int, width: int
) -> np.ndarray:
    """Bilinear resize with align_corners=True semantics.

    Matches ``F.interpolate(..., mode="bilinear", align_corners=True)``
    (util.py:236) — OpenCV/PIL use half-pixel centers, which differ at the
    borders, so the sampling grid is built explicitly here.
    Input (N, H, W, C) float; output (N, height, width, C) float32.
    """
    n, h, w, c = frames.shape
    frames = frames.astype(np.float32)
    if (h, w) == (height, width):
        return frames

    def grid(out_size, in_size):
        if out_size == 1:
            return np.zeros(1, dtype=np.float32)
        scale = (in_size - 1) / (out_size - 1)
        return np.arange(out_size, dtype=np.float32) * scale

    ys = grid(height, h)
    xs = grid(width, w)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0).astype(np.float32)[None, :, None, None]
    wx = (xs - x0).astype(np.float32)[None, None, :, None]

    rows0 = frames[:, y0]  # (N, height, W, C)
    rows1 = frames[:, y1]
    top = rows0[:, :, x0] * (1 - wx) + rows0[:, :, x1] * wx
    bot = rows1[:, :, x0] * (1 - wx) + rows1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def preprocess_video(
    path: str,
    height: int,
    width: int,
    video_length: int,
    duration: Optional[float] = None,
) -> np.ndarray:
    """Decode -> sample ``video_length`` frames -> resize -> scale to [-1, 1].

    Returns float32 (video_length, height, width, 3), channels-last —
    the frame sampling/resize/normalization of util.py:217-242.
    """
    frames, fps = read_video_frames(path)
    total = len(frames)
    if duration is not None and fps > 0:
        total = min(int(fps * duration), total)
    idx = sample_indices(total, video_length)
    picked = frames[idx]

    from motionclone_tpu.io import hostops

    native = hostops.resize_normalize_u8(
        picked, height, width, scale=1.0 / 127.5, shift=-1.0
    )
    if native is not None:
        return native
    resized = resize_bilinear_align_corners(picked, height, width)
    return (resized / np.float32(127.5) - np.float32(1.0)).astype(np.float32)


def load_condition_images(
    paths, height: int, width: int
) -> np.ndarray:
    """Condition images for i2v: RGB in [0, 1], float32 (N, H, W, 3)
    (reference motionclone_functions.py:112-118)."""
    from PIL import Image

    imgs = []
    for p in paths:
        img = Image.open(p).convert("RGB").resize(
            (width, height), Image.BILINEAR
        )
        imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
    return np.stack(imgs)


def write_video(path: str, frames: np.ndarray, fps: int = 8) -> None:
    """Encode RGB uint8 (F, H, W, 3) to mp4 (reference writes with
    imageio.mimwrite at fps=8, t2v_video_sample.py:104)."""
    if frames.dtype != np.uint8:
        raise ValueError("write_video expects uint8 frames")
    f, h, w, _ = frames.shape
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    if not writer.isOpened():
        raise IOError(f"cannot open video writer: {path}")
    for frame in frames:
        writer.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
    writer.release()


def write_video_grid(
    path: str, videos: np.ndarray, n_rows: int = 6, fps: int = 8
) -> None:
    """Tile a batch of videos into one grid clip and encode it.

    Parity with the reference's ``save_videos_grid`` (util.py:87-99), which
    lays ``(B, F, H, W, 3)`` out as an ``n_rows``-per-row image grid per
    frame.  Accepts uint8 or float in [0, 1].
    """
    if videos.ndim != 5:
        raise ValueError(f"expected (B, F, H, W, 3), got {videos.shape}")
    if videos.dtype != np.uint8:
        videos = (np.clip(videos, 0.0, 1.0) * 255).astype(np.uint8)
    b, f, h, w, c = videos.shape
    cols = min(n_rows, b)
    rows = -(-b // cols)
    pad = rows * cols - b
    if pad:
        videos = np.concatenate(
            [videos, np.zeros((pad, f, h, w, c), np.uint8)], axis=0
        )
    # (rows*cols, F, H, W, 3) -> (F, rows*H, cols*W, 3)
    grid = (
        videos.reshape(rows, cols, f, h, w, c)
        .transpose(2, 0, 3, 1, 4, 5)
        .reshape(f, rows * h, cols * w, c)
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    write_video(path, grid, fps=fps)
