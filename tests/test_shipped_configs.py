"""Shipped configs/ tree parses and matches the reference workload knobs.

The reference ships per-workload YAMLs + example JSONLs (SURVEY §2.1:
configs/t2v_camera.yaml:1-18 etc.); ours must stay schema-compatible so a
reference user can point the same files at our CLI.
"""

import os

import pytest

from motionclone_tpu.config import (
    UNet3DConfig,
    load_examples,
    load_inference_config,
    load_model_config,
    load_yaml,
)
from motionclone_tpu.models.sparse_controlnet import SparseControlNetConfig

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cfg_path(*parts):
    return os.path.join(REPO, "configs", *parts)


# (workload, steps, guided, fraction, controlnet?)  reference configs/*.yaml
WORKLOADS = [
    ("t2v_camera", 100, 50, 0.3, False),
    ("t2v_object", 300, 180, 0.4, False),
    ("i2v_rgb", 100, 40, 0.3, True),
    ("i2v_sketch", 200, 120, 0.4, True),
]


@pytest.mark.parametrize("name,steps,guided,frac,has_cn", WORKLOADS)
def test_workload_yaml(name, steps, guided, frac, has_cn):
    cfg = load_inference_config(cfg_path(name + ".yaml"))
    assert cfg.inference_steps == steps
    assert cfg.guidance_steps == guided
    assert cfg.guidance_fraction == frac
    assert cfg.cfg_scale == 7.5
    assert cfg.warm_up_steps == 10 and cfg.cool_up_steps == 10
    assert cfg.motion_guidance_weight == 2000
    assert cfg.motion_guidance_blocks == ("up_blocks.1",)
    assert cfg.add_noise_step == 400
    assert bool(cfg.controlnet_path) == has_cn
    assert bool(cfg.adapter_lora_path) == has_cn
    if has_cn:
        assert os.path.exists(os.path.join(REPO, cfg.controlnet_config))
        assert os.path.exists(os.path.join(REPO, cfg.model_config))


@pytest.mark.parametrize("name,examples", [
    ("t2v_camera", 12), ("t2v_object", 6), ("i2v_rgb", 1), ("i2v_sketch", 1),
])
def test_example_jsonl(name, examples):
    exs = load_examples(cfg_path(name + ".jsonl"))
    assert len(exs) == examples
    for ex in exs:
        assert ex.video_path.endswith(".mp4")
        assert ex.new_prompt
        if name.startswith("i2v"):
            assert len(ex.condition_image_paths) == 1
            assert ex.image_index == (0,)


def test_model_configs():
    # default omits temporal_position_encoding_max_len -> 24 (SURVEY §8)
    unet, sched = load_model_config(cfg_path("model_config", "model_config.yaml"))
    assert unet.motion_module.temporal_position_encoding_max_len == 24
    assert not unet.motion_module_mid_block
    assert sched.beta_start == 0.00085 and sched.beta_end == 0.012
    assert sched.steps_offset == 1 and not sched.clip_sample

    for variant, mid_block in [
        ("model_config_public.yaml", False),
        ("inference-v1.yaml", False),
        ("inference-v2.yaml", True),
        ("inference-v3.yaml", False),
    ]:
        unet, _ = load_model_config(cfg_path("model_config", variant))
        assert unet.motion_module_mid_block == mid_block
        assert unet.motion_module.temporal_position_encoding_max_len == 32


def test_sparsectrl_configs():
    base = UNet3DConfig()
    for name, channels, simplified in [
        ("latent_condition.yaml", 4, True),
        ("image_condition.yaml", 3, False),
    ]:
        raw = load_yaml(cfg_path("sparsectrl", name))
        cn = SparseControlNetConfig.from_yaml_dict(
            raw["controlnet_additional_kwargs"], base
        )
        assert cn.conditioning_channels == channels
        assert cn.use_simplified_condition_embedding == simplified
        assert cn.set_noisy_sample_input_to_zero
        assert cn.motion_module.attention_block_types == ("Temporal_Self",)
        assert cn.motion_module.temporal_position_encoding_max_len == 32
