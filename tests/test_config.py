"""Config parsing against the reference's shipped YAML/JSONL files."""

import os

import pytest

from motionclone_tpu.config import (
    InferenceConfig,
    NoiseScheduleConfig,
    load_examples,
    load_inference_config,
    load_model_config,
)

REF = "/root/reference/configs"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_t2v_camera_yaml():
    cfg = load_inference_config(os.path.join(REF, "t2v_camera.yaml"))
    assert cfg.cfg_scale == 7.5
    assert cfg.inference_steps == 100
    assert cfg.guidance_steps == 50
    assert cfg.guidance_fraction == 0.3
    assert cfg.warm_up_steps == 10 and cfg.cool_up_steps == 10
    assert cfg.motion_guidance_weight == 2000
    assert cfg.motion_guidance_blocks == ("up_blocks.1",)
    assert cfg.add_noise_step == 400
    # the reference's misspelled 'postive_prompt' key must be picked up
    assert "Fujifilm" in cfg.positive_prompt
    assert "bad anatomy" in cfg.negative_prompt


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_t2v_object_yaml():
    cfg = load_inference_config(os.path.join(REF, "t2v_object.yaml"))
    assert cfg.inference_steps == 300
    assert cfg.guidance_steps == 180
    assert cfg.vanilla_steps == 120


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_model_config_yaml():
    unet_cfg, sched_cfg = load_model_config(
        os.path.join(REF, "model_config", "model_config.yaml")
    )
    assert unet_cfg.use_inflated_groupnorm is True
    assert unet_cfg.use_motion_module is True
    assert unet_cfg.motion_module_resolutions == (1, 2, 4, 8)
    assert unet_cfg.motion_module_mid_block is False
    mm = unet_cfg.motion_module
    assert mm.num_attention_heads == 8
    assert mm.num_transformer_block == 1
    assert mm.attention_block_types == ("Temporal_Self", "Temporal_Self")
    assert mm.temporal_position_encoding is True
    # omitted key -> torch default 24 (SURVEY §8)
    assert mm.temporal_position_encoding_max_len == 24
    assert sched_cfg.beta_start == 0.00085
    assert sched_cfg.beta_end == 0.012
    assert sched_cfg.beta_schedule == "linear"
    assert sched_cfg.steps_offset == 1
    assert sched_cfg.clip_sample is False


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference configs not mounted")
def test_examples_jsonl():
    examples = load_examples(os.path.join(REF, "t2v_camera.jsonl"))
    assert len(examples) == 12
    assert all(e.video_path and e.new_prompt for e in examples)
    i2v = load_examples(os.path.join(REF, "i2v_rgb.jsonl"))
    assert len(i2v) == 1
    assert i2v[0].condition_image_paths


def test_validation():
    with pytest.raises(ValueError):
        InferenceConfig(guidance_steps=200, inference_steps=100).validate()
    with pytest.raises(ValueError):
        InferenceConfig(height=100).validate()
    InferenceConfig().validate()


def test_defaults_hashable():
    # frozen configs must be hashable for jit static args
    cfg = NoiseScheduleConfig()
    hash(cfg)
    hash(InferenceConfig())


def test_yaml_size_keys_override_cli_flags(tmp_path):
    """Reference precedence (t2v_video_sample.py:27-29): a YAML W/H/L key
    wins over the CLI flag; the flag only fills in absent keys."""
    p = tmp_path / "c.yaml"
    p.write_text("W: 256\ninference_steps: 4\nguidance_steps: 2\n")
    cfg = load_inference_config(str(p), width=512, height=320, video_length=8)
    assert cfg.width == 256      # YAML wins
    assert cfg.height == 320     # flag fills the absent key
    assert cfg.video_length == 8


def test_cli_parser_accepts_reference_flags():
    """The reference driver's full flag surface must parse
    (reference t2v_video_sample.py:107-124): a user switching over with an
    existing command line must not hit argparse errors."""
    from motionclone_tpu.cli import build_parser

    parser = build_parser("configs/t2v_camera.yaml", "configs/t2v_camera.jsonl")
    args = parser.parse_args(
        [
            "--pretrained-model-path", "models/StableDiffusion",
            "--inference_config", "configs/t2v_camera.yaml",
            "--examples", "configs/t2v_camera.jsonl",
            "--motion-representation-save-dir", "motion_representation/",
            "--generated-videos-save-dir", "generated_videos",
            "--visible_gpu", "0",
            "--default-seed", "2025",
            "--L", "16", "--W", "512", "--H", "512",
            "--without-xformers",
        ]
    )
    assert args.visible_gpu == "0"
    assert args.without_xformers is True
    # --without-xformers maps to the plain-XLA attention backend in _setup
    assert args.attention_impl == "auto"


def test_cli_default_surfaces_match_reference():
    """Bare ``python t2v_video_sample.py`` / ``i2v_video_sample.py`` must run
    the same workload as the reference: t2v defaults to the camera config with
    seed 2025 (reference t2v_video_sample.py:111-118), i2v to the *sketch*
    config with seed 76739 — the seed of the committed sample outputs
    (reference i2v_video_sample.py:143-150)."""
    from motionclone_tpu.cli import build_parser

    t2v = build_parser(
        "configs/t2v_camera.yaml", "configs/t2v_camera.jsonl"
    ).parse_args([])
    assert t2v.inference_config == "configs/t2v_camera.yaml"
    assert t2v.default_seed == 2025

    i2v = build_parser(
        "configs/i2v_sketch.yaml", "configs/i2v_sketch.jsonl", default_seed=76739
    ).parse_args([])
    assert i2v.inference_config == "configs/i2v_sketch.yaml"
    assert i2v.examples == "configs/i2v_sketch.jsonl"
    assert i2v.default_seed == 76739

    # and i2v_main itself wires those defaults (source-level assertion — the
    # main cannot run without checkpoints)
    import inspect

    from motionclone_tpu import cli

    src = inspect.getsource(cli.i2v_main)
    assert "i2v_sketch.yaml" in src and "76739" in src
