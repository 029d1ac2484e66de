"""High-level weight assembly: files -> validated flax parameter trees.

Mirrors the reference's loading flow (t2v_video_sample.py:23-53 +
util.py:115-215 ``load_weights``):

  1. base SD1.5 weights from a diffusers-format directory (2D UNet keys
     load into the 3D tree non-strictly — motion modules come later);
  2. motion-module checkpoint merged in (keys containing
     ``motion_modules.``, util.py:128-137);
  3. optional DreamBooth LDM checkpoint replacing UNet/VAE/CLIP bases
     (util.py:142-168);
  4. optional LoRA merges (util.py:185-213);
  5. torch->flax conversion and strict shape/coverage validation.

Every step operates on flat numpy state dicts; nothing touches the
accelerator until the final device put.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import UNet3DConfig
from motionclone_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig
from motionclone_tpu.weights.convert import (
    merge_state_dicts,
    torch_to_flax,
    validate_against,
)
from motionclone_tpu.weights.io import load_state_dict
from motionclone_tpu.weights.ldm import (
    convert_ldm_clip,
    convert_ldm_unet,
    convert_ldm_vae,
)
from motionclone_tpu.weights.lora import merge_diffusers_lora, merge_kohya_lora

StateDict = Dict[str, np.ndarray]


def _first_existing(*paths: str) -> Optional[str]:
    for p in paths:
        if os.path.isfile(p):
            return p
    return None


def _shape_tree(model, *args) -> Mapping[str, Any]:
    """Parameter shapes via abstract evaluation — no FLOPs, no memory."""
    return jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), *args))


# ---------------------------------------------------------------------------
# per-model state-dict -> flax tree
# ---------------------------------------------------------------------------


def unet_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    unet_cfg: UNet3DConfig,
    *,
    dtype: Optional[np.dtype] = None,
    validate: bool = True,
) -> Dict[str, Any]:
    tree = torch_to_flax(sd, dtype=dtype)
    if validate:
        model = UNet3DConditionModel(cfg=unet_cfg)
        sample = jnp.zeros((1, 2, 8, 8, unet_cfg.in_channels))
        ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
        ref = _shape_tree(model, sample, jnp.zeros((1,), jnp.int32), ctx)
        validate_against({"params": tree}, ref)
    return {"params": tree}


def vae_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    vae_cfg: VAEConfig,
    *,
    dtype: Optional[np.dtype] = None,
    validate: bool = True,
) -> Dict[str, Any]:
    tree = torch_to_flax(sd, dtype=dtype)
    if validate:
        model = AutoencoderKL(cfg=vae_cfg)
        x = jnp.zeros((1, 1, 32, 32, vae_cfg.in_channels))
        ref = _shape_tree(model, x)
        validate_against({"params": tree}, ref)
    return {"params": tree}


def clip_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    clip_cfg: CLIPTextConfig,
    *,
    dtype: Optional[np.dtype] = None,
    validate: bool = True,
) -> Dict[str, Any]:
    """HF CLIPTextModel keys -> our flax tree (flat text tower)."""
    remapped: StateDict = {}
    for k, v in sd.items():
        key = k
        if key.startswith("text_model."):
            key = key[len("text_model."):]
        if key.endswith("position_ids") or key.startswith("text_projection"):
            continue
        key = key.replace("embeddings.token_embedding", "token_embedding")
        key = key.replace("embeddings.position_embedding", "position_embedding")
        key = key.replace("encoder.layers.", "layers.")
        key = key.replace("mlp.fc1", "mlp_fc1").replace("mlp.fc2", "mlp_fc2")
        remapped[key] = v
    tree = torch_to_flax(remapped, dtype=dtype)
    if validate:
        model = CLIPTextModel(cfg=clip_cfg)
        ids = jnp.zeros((1, clip_cfg.max_position_embeddings), jnp.int32)
        ref = _shape_tree(model, ids)
        validate_against({"params": tree}, ref)
    return {"params": tree}


def controlnet_params_from_state_dict(
    sd: Mapping[str, np.ndarray],
    cn_cfg,
    *,
    dtype: Optional[np.dtype] = None,
    validate: bool = True,
) -> Dict[str, Any]:
    """SparseCtrl checkpoint -> flax tree (reference i2v_video_sample.py:54-59:
    strict load with pos_encoder.pe and animatediff_config filtered)."""
    from motionclone_tpu.models.sparse_controlnet import SparseControlNetModel

    sd = {
        k: v
        for k, v in sd.items()
        if "pos_encoder.pe" not in k and k != "animatediff_config"
    }
    tree = torch_to_flax(sd, dtype=dtype)
    if validate:
        model = SparseControlNetModel(cfg=cn_cfg)
        sample = jnp.zeros((1, 2, 8, 8, cn_cfg.in_channels))
        ctx = jnp.zeros((1, 77, cn_cfg.cross_attention_dim))
        cond_hw = 8 if cn_cfg.use_simplified_condition_embedding else 8 * (
            2 ** (len(cn_cfg.conditioning_embedding_out_channels) - 1)
        )
        cond = jnp.zeros((1, 2, cond_hw, cond_hw, cn_cfg.conditioning_channels))
        mask = jnp.zeros((1, 2, cond_hw, cond_hw, 1))
        ref = _shape_tree(model, sample, jnp.zeros((1,), jnp.int32), ctx, cond, mask)
        validate_against({"params": tree}, ref)
    return {"params": tree}


# ---------------------------------------------------------------------------
# diffusers config.json honoring (reference from_pretrained behavior)
# ---------------------------------------------------------------------------


def load_diffusers_config(
    pretrained_dir: str, subfolder: str
) -> Optional[Mapping[str, Any]]:
    """The ``config.json`` of a diffusers-layout subfolder, or None.

    The reference builds its models from these files —
    ``UNet3DConditionModel.from_pretrained_2d`` reads ``unet/config.json``
    (reference unet.py:477-490) and ``AutoencoderKL`` /
    ``CLIPTextModel.from_pretrained`` read theirs (t2v_video_sample.py:24-25)
    — so checkpoint directories with non-SD1.5 topologies load correctly.
    """
    p = os.path.join(pretrained_dir, subfolder, "config.json")
    if not os.path.isfile(p):
        return None
    with open(p, "r") as f:
        return json.load(f)


# 2D->3D block-class inflation (reference unet.py:490-497 passes the 2D
# config's block names through the 3D factories after renaming)
_BLOCK_2D_TO_3D = {
    "CrossAttnDownBlock2D": "CrossAttnDownBlock3D",
    "DownBlock2D": "DownBlock3D",
    "UpBlock2D": "UpBlock3D",
    "CrossAttnUpBlock2D": "CrossAttnUpBlock3D",
}


def apply_unet_diffusers_config(
    unet_cfg: UNet3DConfig, pretrained_dir: str
) -> UNet3DConfig:
    """Overlay ``unet/config.json`` topology fields onto the model-config
    UNet3DConfig (2D block classes inflated to 3D).  Absent file -> the
    config is returned unchanged (SD1.5 defaults, the reference layout)."""
    d = load_diffusers_config(pretrained_dir, "unet")
    if d is None:
        return unet_cfg
    kwargs: Dict[str, Any] = {}
    for k in (
        "sample_size",
        "in_channels",
        "out_channels",
        "layers_per_block",
        "norm_num_groups",
        "cross_attention_dim",
        "attention_head_dim",
        "flip_sin_to_cos",
        "freq_shift",
        "use_linear_projection",
    ):
        if k in d and d[k] is not None:
            kwargs[k] = d[k]
    # diffusers configs may carry a per-block head list (e.g. [5,10,20,20]);
    # UNet3DConfig.attention_head_dim is the global head COUNT
    # (diffusers-legacy naming) — a list would silently break head
    # arithmetic downstream, so reject it loudly
    ahd = kwargs.get("attention_head_dim")
    if ahd is not None and not isinstance(ahd, int):
        raise ValueError(
            f"unet/config.json attention_head_dim={ahd!r}: per-block head "
            "lists are not supported (UNet3DConfig takes a single int — "
            "the diffusers-legacy global head count)"
        )
    if d.get("block_out_channels"):
        kwargs["block_out_channels"] = tuple(d["block_out_channels"])
    if d.get("down_block_types"):
        kwargs["down_block_types"] = tuple(
            _BLOCK_2D_TO_3D.get(b, b) for b in d["down_block_types"]
        )
    if d.get("up_block_types"):
        kwargs["up_block_types"] = tuple(
            _BLOCK_2D_TO_3D.get(b, b) for b in d["up_block_types"]
        )
    return dataclasses.replace(unet_cfg, **kwargs)


def vae_config_from_dir(pretrained_dir: str) -> VAEConfig:
    """``vae/config.json`` -> VAEConfig (SD1.5 defaults when absent)."""
    d = load_diffusers_config(pretrained_dir, "vae")
    if d is None:
        return VAEConfig()
    kwargs: Dict[str, Any] = {}
    for k in (
        "in_channels",
        "out_channels",
        "latent_channels",
        "layers_per_block",
        "norm_num_groups",
        "scaling_factor",
    ):
        if k in d and d[k] is not None:
            kwargs[k] = d[k]
    if d.get("block_out_channels"):
        kwargs["block_out_channels"] = tuple(d["block_out_channels"])
    return VAEConfig(**kwargs)


def clip_config_from_dir(pretrained_dir: str) -> CLIPTextConfig:
    """``text_encoder/config.json`` (transformers field names) ->
    CLIPTextConfig (SD1.5's CLIP ViT-L/14 text tower when absent)."""
    d = load_diffusers_config(pretrained_dir, "text_encoder")
    if d is None:
        return CLIPTextConfig()
    base = CLIPTextConfig()
    return CLIPTextConfig(
        vocab_size=d.get("vocab_size", base.vocab_size),
        hidden_size=d.get("hidden_size", base.hidden_size),
        num_layers=d.get("num_hidden_layers", base.num_layers),
        num_heads=d.get("num_attention_heads", base.num_heads),
        max_position_embeddings=d.get(
            "max_position_embeddings", base.max_position_embeddings
        ),
        intermediate_size=d.get("intermediate_size", base.intermediate_size),
        layer_norm_eps=d.get("layer_norm_eps", base.layer_norm_eps),
        # an SD2.x-style text encoder declares exact gelu here; hard-coding
        # quick_gelu would load cleanly but embed wrongly — CLIPTextConfig
        # rejects names it cannot honor
        hidden_act=d.get("hidden_act", base.hidden_act),
    )


# ---------------------------------------------------------------------------
# directory-level assembly
# ---------------------------------------------------------------------------


def resolve_diffusers_module_path(
    pretrained_dir: str, subfolder: str
) -> Optional[str]:
    """The checkpoint file a diffusers-layout subfolder resolves to (None if
    absent) — also used to fingerprint sources for the parameter cache."""
    return _first_existing(
        os.path.join(pretrained_dir, subfolder, "diffusion_pytorch_model.safetensors"),
        os.path.join(pretrained_dir, subfolder, "diffusion_pytorch_model.bin"),
        os.path.join(pretrained_dir, subfolder, "model.safetensors"),
        os.path.join(pretrained_dir, subfolder, "pytorch_model.bin"),
    )


def load_diffusers_module_sd(pretrained_dir: str, subfolder: str) -> StateDict:
    path = resolve_diffusers_module_path(pretrained_dir, subfolder)
    if path is None:
        raise FileNotFoundError(
            f"no checkpoint found under {pretrained_dir}/{subfolder}"
        )
    return load_state_dict(path)


def assemble_pipeline_state_dicts(
    pretrained_dir: str,
    *,
    motion_module_path: str = "",
    dreambooth_path: str = "",
    adapter_lora_path: str = "",
    adapter_lora_scale: float = 1.0,
    lora_model_path: str = "",
    lora_alpha: float = 0.8,
    motion_lora_configs: Sequence[Tuple[str, float]] = (),
    dreambooth_extract_ema: bool = False,
) -> Dict[str, StateDict]:
    """Produce final flat state dicts for unet/vae/text_encoder.

    The UNet dict includes merged motion-module weights; DreamBooth
    checkpoints override base SD weights exactly as the reference does
    (util.py:142-168: VAE and CLIP fully replaced, UNet image layers
    replaced with motion modules retained).  Optional merges mirror the
    rest of the reference's ``load_weights`` (util.py:115-215): a kohya
    image LoRA applied to UNet + text encoder (``lora_model_path``,
    :185-194) and any number of motion LoRAs (``motion_lora_configs``,
    list of (path, alpha), :205-213).
    """
    sd_unet = load_diffusers_module_sd(pretrained_dir, "unet")
    sd_vae = load_diffusers_module_sd(pretrained_dir, "vae")
    sd_clip = load_diffusers_module_sd(pretrained_dir, "text_encoder")

    if dreambooth_path:
        db = load_state_dict(dreambooth_path)
        sd_unet_db = convert_ldm_unet(db, extract_ema=dreambooth_extract_ema)
        sd_vae_db = convert_ldm_vae(db)
        sd_clip_db = convert_ldm_clip(db)
        if sd_unet_db:
            sd_unet = merge_state_dicts(sd_unet, sd_unet_db)
        if sd_vae_db:
            sd_vae = sd_vae_db
        if sd_clip_db:
            sd_clip = sd_clip_db

    if motion_module_path:
        mm = load_state_dict(motion_module_path)
        sd_unet = merge_state_dicts(sd_unet, mm, filter_substring="motion_modules.")

    if lora_model_path:
        lora = load_state_dict(lora_model_path)
        sd_unet = merge_kohya_lora(sd_unet, lora, alpha=lora_alpha,
                                   prefix="lora_unet")
        sd_clip = merge_kohya_lora(sd_clip, lora, alpha=lora_alpha,
                                   prefix="lora_te")

    if adapter_lora_path:
        lora = load_state_dict(adapter_lora_path)
        sd_unet = merge_diffusers_lora(sd_unet, lora, alpha=adapter_lora_scale)

    for path, alpha in motion_lora_configs:
        lora = load_state_dict(path)
        sd_unet = merge_diffusers_lora(sd_unet, lora, alpha=alpha)

    return {"unet": sd_unet, "vae": sd_vae, "text_encoder": sd_clip}
