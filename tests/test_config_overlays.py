"""diffusers config.json overlays -> our model configs (weights/load.py).

The reference builds its models straight from these files
(reference t2v_video_sample.py:24-25, unet.py:477-497), so a checkpoint
directory's declared topology/activation/scaling must be honored — or
rejected loudly — never silently defaulted.
"""

import json
import os

import pytest

from motionclone_tpu.config import UNet3DConfig
from motionclone_tpu.weights.load import (
    apply_unet_diffusers_config,
    clip_config_from_dir,
    vae_config_from_dir,
)


def _write_cfg(tmp_path, subfolder, d):
    p = tmp_path / subfolder
    os.makedirs(p, exist_ok=True)
    with open(p / "config.json", "w") as f:
        json.dump(d, f)
    return str(tmp_path)


def test_clip_hidden_act_read(tmp_path):
    root = _write_cfg(tmp_path, "text_encoder", {"hidden_act": "gelu",
                                                 "hidden_size": 1024})
    cfg = clip_config_from_dir(root)
    assert cfg.hidden_act == "gelu"
    assert cfg.hidden_size == 1024


def test_clip_unsupported_hidden_act_raises(tmp_path):
    root = _write_cfg(tmp_path, "text_encoder", {"hidden_act": "relu"})
    with pytest.raises(ValueError, match="hidden_act"):
        clip_config_from_dir(root)


def test_clip_defaults_when_absent(tmp_path):
    cfg = clip_config_from_dir(str(tmp_path))
    assert cfg.hidden_act == "quick_gelu"


def test_unet_per_block_head_list_rejected(tmp_path):
    root = _write_cfg(tmp_path, "unet", {"attention_head_dim": [5, 10, 20, 20]})
    with pytest.raises(ValueError, match="attention_head_dim"):
        apply_unet_diffusers_config(UNet3DConfig(), root)


def test_unet_use_linear_projection_overlaid(tmp_path):
    root = _write_cfg(
        tmp_path, "unet", {"use_linear_projection": True, "attention_head_dim": 8}
    )
    cfg = apply_unet_diffusers_config(UNet3DConfig(), root)
    assert cfg.use_linear_projection is True
    assert cfg.attention_head_dim == 8


def test_vae_scaling_factor_overlaid(tmp_path):
    root = _write_cfg(tmp_path, "vae", {"scaling_factor": 0.13025})
    cfg = vae_config_from_dir(root)
    assert cfg.scaling_factor == pytest.approx(0.13025)
