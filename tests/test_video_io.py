"""Video IO: decode/sample/resize parity checks (torch oracle for resize)."""

import os

import numpy as np
import pytest

from motionclone_tpu.io.video import (
    preprocess_video,
    resize_bilinear_align_corners,
    sample_indices,
    write_video,
)

REF_VIDEO = "/root/reference/reference_videos/camera_zoom_out.mp4"


def test_sample_indices_matches_reference_rule():
    # util.py:230: np.linspace(0, total-1, video_length, dtype=int)
    np.testing.assert_array_equal(
        sample_indices(72, 16), np.linspace(0, 71, 16, dtype=int)
    )


def test_resize_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 255, size=(2, 17, 23, 3)).astype(np.float32)
    ours = resize_bilinear_align_corners(x, 32, 48)
    ref = (
        F.interpolate(
            torch.tensor(x).permute(0, 3, 1, 2),
            size=(32, 48),
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_identity():
    x = np.random.default_rng(1).normal(size=(1, 8, 8, 3)).astype(np.float32)
    np.testing.assert_array_equal(resize_bilinear_align_corners(x, 8, 8), x)


@pytest.mark.skipif(not os.path.isfile(REF_VIDEO), reason="reference video absent")
def test_preprocess_reference_video():
    out = preprocess_video(REF_VIDEO, 64, 64, 8)
    assert out.shape == (8, 64, 64, 3)
    assert out.dtype == np.float32
    # 1e-6 slack: the native path multiplies by f32(1/127.5) (1 ulp off the
    # reference's division)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    assert out.std() > 0.05  # real content


def test_write_roundtrip(tmp_path):
    frames = np.random.default_rng(0).integers(
        0, 255, size=(4, 32, 32, 3), dtype=np.uint8
    ).astype(np.uint8)
    path = str(tmp_path / "out.mp4")
    write_video(path, frames, fps=8)
    assert os.path.getsize(path) > 0
    from motionclone_tpu.io.video import read_video_frames

    decoded, fps = read_video_frames(path)
    assert decoded.shape == (4, 32, 32, 3)
    assert abs(fps - 8) < 0.5


def test_write_video_grid(tmp_path):
    """Grid writer tiles (B, F, H, W, 3) into one clip
    (reference save_videos_grid, util.py:87-99)."""
    from motionclone_tpu.io.video import read_video_frames, write_video_grid

    rng = np.random.default_rng(0)
    videos = rng.uniform(0, 1, size=(5, 4, 32, 48, 3)).astype(np.float32)
    path = str(tmp_path / "grid.mp4")
    write_video_grid(path, videos, n_rows=3, fps=8)
    frames, fps = read_video_frames(path)
    # 5 videos, 3 per row -> 2 rows x 3 cols
    assert frames.shape == (4, 2 * 32, 3 * 48, 3)
    assert fps == 8
