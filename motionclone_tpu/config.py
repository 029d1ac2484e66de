"""Typed, frozen configuration for the MotionClone TPU pipeline.

The reference threads a mutable OmegaConf object through every layer (it is
even read inside the UNet forward, reference t2v_video_sample.py:69,81 and
motionclone_functions.py:602).  Here configuration is explicit, frozen
dataclasses: hashable so they can be closed over by ``jax.jit`` as static
arguments, with YAML/JSONL parsing kept byte-compatible with the reference's
config files (reference configs/t2v_camera.yaml, configs/model_config/*.yaml).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Mapping, Optional, Sequence, Tuple

import yaml


# ---------------------------------------------------------------------------
# Model topology
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class MotionModuleConfig:
    """Temporal motion-module topology.

    Mirrors ``motion_module_kwargs`` (reference
    configs/model_config/model_config.yaml:8-14, motion_module.py:51-78).
    """

    num_attention_heads: int = 8
    num_transformer_block: int = 1
    attention_block_types: Tuple[str, ...] = ("Temporal_Self", "Temporal_Self")
    temporal_position_encoding: bool = True
    # NOTE: the reference's model_config.yaml omits this key so the torch
    # default of 24 applies (reference motion_module.py:233, SURVEY §8).
    temporal_position_encoding_max_len: int = 24
    temporal_attention_dim_div: int = 1
    zero_initialize: bool = True
    # fixed at 32 in the reference (motion_module.py:98); configurable here so
    # tiny test models can use narrow channels
    norm_num_groups: int = 32

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "MotionModuleConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in known}
        if "attention_block_types" in kwargs:
            kwargs["attention_block_types"] = tuple(kwargs["attention_block_types"])
        return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    """AnimateDiff SD1.5 UNet3D topology (reference unet.py:42-91).

    ``attention_head_dim`` follows the diffusers-legacy convention: it is the
    *number of heads* per spatial attention (head width = channels // heads).
    """

    sample_size: Optional[int] = None
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
        "CrossAttnUpBlock3D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    attention_head_dim: int = 8  # number of heads (diffusers-legacy naming)
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    use_inflated_groupnorm: bool = True
    use_linear_projection: bool = False
    # Motion-module insertion (reference unet.py:83-88,157,183,236)
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_module_decoder_only: bool = False
    motion_module: MotionModuleConfig = MotionModuleConfig()

    @property
    def num_heads(self) -> int:
        return self.attention_head_dim

    @classmethod
    def from_unet_additional_kwargs(
        cls, d: Mapping[str, Any], **overrides: Any
    ) -> "UNet3DConfig":
        """Build from the YAML ``unet_additional_kwargs`` block."""
        kwargs: dict = {}
        if "use_inflated_groupnorm" in d:
            kwargs["use_inflated_groupnorm"] = bool(d["use_inflated_groupnorm"])
        if "use_motion_module" in d:
            kwargs["use_motion_module"] = bool(d["use_motion_module"])
        if "motion_module_resolutions" in d:
            kwargs["motion_module_resolutions"] = tuple(d["motion_module_resolutions"])
        if "motion_module_mid_block" in d:
            kwargs["motion_module_mid_block"] = bool(d["motion_module_mid_block"])
        if "motion_module_decoder_only" in d:
            kwargs["motion_module_decoder_only"] = bool(d["motion_module_decoder_only"])
        if "motion_module_kwargs" in d:
            kwargs["motion_module"] = MotionModuleConfig.from_dict(
                d["motion_module_kwargs"]
            )
        kwargs.update(overrides)
        return cls(**kwargs)


@dataclasses.dataclass(frozen=True)
class NoiseScheduleConfig:
    """DDIM noise schedule (reference configs/model_config/model_config.yaml:16-20)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "linear"
    steps_offset: int = 1
    clip_sample: bool = False
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True
    prediction_type: str = "epsilon"
    # dynamic thresholding (Imagen, arXiv:2205.11487) — the reference's step
    # supports it via diffusers' DDIMScheduler config
    # (motionclone_functions.py:355-357); no shipped config enables it
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "NoiseScheduleConfig":
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})


# ---------------------------------------------------------------------------
# Inference configuration (per-workload YAML + per-example JSONL)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class InferenceConfig:
    """One workload's knobs (reference configs/t2v_camera.yaml et al.).

    ``guidance_fraction`` is the YAML key ``guidance_scale`` — in the
    reference that key means *fraction of the 1000-step range reserved for
    guidance* while the DDIM-step score scale is a separate (default 1.0)
    parameter (SURVEY §8); renamed internally, YAML key preserved.
    """

    # model assets
    motion_module: str = ""
    dreambooth_path: str = ""
    model_config: str = ""
    # prompts
    cfg_scale: float = 7.5
    negative_prompt: str = ""
    positive_prompt: str = ""
    # schedule
    inference_steps: int = 100
    guidance_fraction: float = 0.3
    guidance_steps: int = 50
    warm_up_steps: int = 10
    cool_up_steps: int = 10
    # motion guidance
    motion_guidance_weight: float = 2000.0
    motion_guidance_blocks: Tuple[str, ...] = ("up_blocks.1",)
    add_noise_step: int = 400
    # geometry
    width: int = 512
    height: int = 512
    video_length: int = 16
    # controlnet (i2v workloads; reference configs/i2v_rgb.yaml)
    controlnet_path: str = ""
    controlnet_config: str = ""
    controlnet_scale: float = 1.0
    adapter_lora_path: str = ""
    adapter_lora_scale: float = 1.0

    @property
    def vanilla_steps(self) -> int:
        return self.inference_steps - self.guidance_steps

    def validate(self) -> None:
        if self.guidance_steps > self.inference_steps:
            raise ValueError(
                f"guidance_steps ({self.guidance_steps}) cannot exceed "
                f"inference_steps ({self.inference_steps})"
            )
        if not 0.0 <= self.guidance_fraction <= 1.0:
            raise ValueError(f"guidance_fraction must be in [0,1], got {self.guidance_fraction}")
        if self.height % 8 or self.width % 8:
            raise ValueError("height and width must be divisible by 8")


@dataclasses.dataclass(frozen=True)
class Example:
    """One JSONL example (reference configs/t2v_camera.jsonl)."""

    video_path: str
    new_prompt: str
    seed: Optional[int] = None
    # i2v extras (reference i2v_video_sample.py:107-123)
    condition_image_paths: Tuple[str, ...] = ()
    image_index: Tuple[int, ...] = (0,)
    controlnet_scale: Optional[float] = None

    @classmethod
    def from_json(cls, d: Mapping[str, Any]) -> "Example":
        return cls(
            video_path=d["video_path"],
            new_prompt=d["new_prompt"],
            seed=d.get("seed"),
            condition_image_paths=tuple(d.get("condition_image_paths", ())),
            image_index=tuple(d.get("image_index", (0,))),
            controlnet_scale=d.get("controlnet_scale"),
        )


def load_yaml(path: str) -> dict:
    with open(path, "r") as f:
        return yaml.safe_load(f)


def load_inference_config(path: str, **overrides: Any) -> InferenceConfig:
    """Parse a reference-format workload YAML into an :class:`InferenceConfig`.

    Accepts both the reference's ``postive_prompt`` misspelling
    (configs/t2v_camera.yaml:8) and the corrected ``positive_prompt``
    (SURVEY §8: support both keys).

    ``overrides`` are fallback defaults: a key present in the YAML wins,
    matching the reference's ``config.get("W", args.W)`` precedence
    (t2v_video_sample.py:27-29 — YAML size keys override the CLI flags).
    """
    raw = load_yaml(path)
    kwargs: dict = {}

    def take(yaml_key: str, field: str, cast=None):
        if yaml_key in raw:
            v = raw[yaml_key]
            kwargs[field] = cast(v) if cast is not None else v

    take("motion_module", "motion_module", str)
    take("dreambooth_path", "dreambooth_path", str)
    take("model_config", "model_config", str)
    take("cfg_scale", "cfg_scale", float)
    take("negative_prompt", "negative_prompt", str)
    # both spellings; corrected key wins if both present
    take("postive_prompt", "positive_prompt", str)
    take("positive_prompt", "positive_prompt", str)
    take("inference_steps", "inference_steps", int)
    take("guidance_scale", "guidance_fraction", float)
    take("guidance_steps", "guidance_steps", int)
    take("warm_up_steps", "warm_up_steps", int)
    take("cool_up_steps", "cool_up_steps", int)
    take("motion_guidance_weight", "motion_guidance_weight", float)
    if "motion_guidance_blocks" in raw:
        kwargs["motion_guidance_blocks"] = tuple(raw["motion_guidance_blocks"])
    take("add_noise_step", "add_noise_step", int)
    take("W", "width", int)
    take("H", "height", int)
    take("L", "video_length", int)
    take("controlnet_path", "controlnet_path", str)
    take("controlnet_config", "controlnet_config", str)
    take("controlnet_scale", "controlnet_scale", float)
    take("adapter_lora_path", "adapter_lora_path", str)
    take("adapter_lora_scale", "adapter_lora_scale", float)

    for k, v in overrides.items():
        kwargs.setdefault(k, v)
    cfg = InferenceConfig(**kwargs)
    cfg.validate()
    return cfg


def load_model_config(path: str) -> Tuple[UNet3DConfig, NoiseScheduleConfig]:
    """Parse a reference-format model-config YAML (model_config.yaml)."""
    raw = load_yaml(path)
    unet_cfg = UNet3DConfig.from_unet_additional_kwargs(
        raw.get("unet_additional_kwargs", {})
    )
    sched_cfg = NoiseScheduleConfig.from_dict(raw.get("noise_scheduler_kwargs", {}))
    return unet_cfg, sched_cfg


def load_examples(path: str) -> list:
    """Parse a reference-format JSONL example stream."""
    examples = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            examples.append(Example.from_json(json.loads(line)))
    return examples


# ---------------------------------------------------------------------------
# Tiny configs for tests
# ---------------------------------------------------------------------------


def micro_unet_config() -> UNet3DConfig:
    """A 2-level UNet3D for sharding dry runs (``__graft_entry__.py``).

    Keeps every structural element the multi-chip layouts exercise — a
    CrossAttn and a plain block on each side, motion modules at every
    layer, the ``up_blocks.1`` guidance block, skip concats, one
    down/upsampler — at roughly half the compile-time of
    :func:`tiny_unet_config` (the dryrun budget is XLA:CPU compile-bound
    on a 1-CPU driver host; sharding correctness is depth-independent and
    full-topology coverage lives in the test suite)."""
    return UNet3DConfig(
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        block_out_channels=(8, 16),
        layers_per_block=1,
        norm_num_groups=4,
        cross_attention_dim=16,
        attention_head_dim=2,
        motion_module=MotionModuleConfig(
            num_attention_heads=2,
            num_transformer_block=1,
            attention_block_types=("Temporal_Self", "Temporal_Self"),
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=24,
            norm_num_groups=4,
        ),
    )


def production_channel_unet_config() -> UNet3DConfig:
    """A 2-level UNet3D at PRODUCTION channel counts for the multi-chip
    dry run (``__graft_entry__.py``): 320/640 channels, 32 norm groups,
    8 spatial + 8 temporal heads, ctx 768 — every per-channel quantity is
    the real SD1.5/AnimateDiff one (reference unet.py:64,
    model_config.yaml:8-12); only the depth is reduced (the dryrun budget
    is XLA:CPU compile-bound).  Sharding bugs tied to channel arithmetic —
    GroupNorm group splits, head splits, skip-concat widths — surface here
    where the micro config's 8/16 channels cannot expose them."""
    return UNet3DConfig(
        down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
        up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
        block_out_channels=(320, 640),
        layers_per_block=1,
    )


def tiny_unet_config() -> UNet3DConfig:
    """A miniature UNet3D with the same topology shape, for fast CPU tests."""
    return UNet3DConfig(
        block_out_channels=(8, 16, 16, 16),
        layers_per_block=1,
        norm_num_groups=4,
        cross_attention_dim=16,
        attention_head_dim=2,
        motion_module=MotionModuleConfig(
            num_attention_heads=2,
            num_transformer_block=1,
            attention_block_types=("Temporal_Self", "Temporal_Self"),
            temporal_position_encoding=True,
            temporal_position_encoding_max_len=24,
            norm_num_groups=4,
        ),
    )
