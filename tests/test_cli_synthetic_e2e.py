"""Full file-to-mp4 CLI pass on synthetic checkpoints (VERDICT r3 ask #5).

Writes to disk, at a tiny SD1.5-SHAPED topology (4 levels, 2 layers per
block — the full SD1.5 key-name inventory at small tensor sizes):

- a diffusers-layout base model dir (``unet`` / ``vae`` / ``text_encoder``
  safetensors + per-module ``config.json`` + ``tokenizer`` vocab/merges),
- a DreamBooth checkpoint in the original LDM key layout
  (``model.diffusion_model.*`` / ``first_stage_model.*`` /
  ``cond_stage_model.transformer.*`` in one ``.safetensors``),
- an AnimateDiff motion-module ``.ckpt`` (torch format, including the
  ``pos_encoder.pe`` buffers the loader must skip —
  reference i2v_video_sample.py:54-59),
- a diffusers-format adapter LoRA,

then runs the ACTUAL t2v CLI (``cli.t2v_main`` — exactly what
``t2v_video_sample.py`` wraps) against them through video preprocessing,
motion extraction, guided sampling, and VAE decode to an mp4.  This covers
the last seam between ``weights/`` and ``cli.py`` short of real weights
(reference load path: util.py:115-215 ``load_weights``); the piecewise
conversion units live in test_weights.py.

The LDM dicts are produced by a test-side INVERSE of weights/ldm.py's
mapping (diffusers -> LDM keys), so the round trip through
``convert_ldm_{unet,vae,clip}`` exercises the full key inventory.
"""

import glob
import json
import os

import numpy as np
import pytest
import yaml

from test_weights import _flax_path_to_torch_key, _inverse_transform

import jax
import jax.numpy as jnp

from motionclone_tpu.config import MotionModuleConfig, UNet3DConfig
from motionclone_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig
from motionclone_tpu.weights.convert import flatten_tree
from motionclone_tpu.weights.ldm import _RESNET_MAP, _VAE_ATTN_MAP, _VAE_RESNET_MAP

_INV_RESNET = {v: k for k, v in _RESNET_MAP.items()}
_INV_VAE_RESNET = {v: k for k, v in _VAE_RESNET_MAP.items()}
_INV_VAE_ATTN = {v: k for k, v in _VAE_ATTN_MAP.items()}


# ---------------------------------------------------------------------------
# tiny SD1.5-shaped configs (full key inventory, small tensors)
# ---------------------------------------------------------------------------


def _tiny_sd15_unet_cfg() -> UNet3DConfig:
    return UNet3DConfig(
        block_out_channels=(8, 16, 16, 16),
        layers_per_block=2,
        norm_num_groups=4,
        cross_attention_dim=16,
        attention_head_dim=2,
        motion_module=MotionModuleConfig(
            num_attention_heads=2, norm_num_groups=4
        ),
    )


def _tiny_sd15_vae_cfg() -> VAEConfig:
    # 4 levels -> the SD 8x downscale the pipeline assumes
    return VAEConfig(
        block_out_channels=(8, 8, 16, 16), layers_per_block=2, norm_num_groups=4
    )


def _tiny_clip_cfg(vocab_size: int) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=vocab_size, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position_embeddings=77,
    )


def _synth(tree, seed):
    """Random torch-style (diffusers-key) state dict matching a flax tree."""
    rng = np.random.default_rng(seed)
    sd = {}
    for path, arr in flatten_tree(tree["params"]).items():
        leaf = path.split("/")[-1]
        val = 0.05 * rng.normal(size=tuple(arr.shape)).astype(np.float32)
        # contiguous: safetensors serializes the raw buffer, so a transposed
        # VIEW would be written in its source layout (silent permutation)
        sd[_flax_path_to_torch_key(path)] = np.ascontiguousarray(
            _inverse_transform(leaf, val)
        )
    return sd


def _clip_hf_sd(tree, seed):
    """Random HF-format CLIPTextModel state dict matching our flax tree."""
    rng = np.random.default_rng(seed)
    sd = {}
    for path, arr in flatten_tree(tree["params"]).items():
        leaf = path.split("/")[-1]
        val = 0.05 * rng.normal(size=tuple(arr.shape)).astype(np.float32)
        k = _flax_path_to_torch_key(path)
        k = k.replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2")
        if k.startswith("layers."):
            k = "encoder." + k
        if k.startswith(("token_embedding.", "position_embedding.")):
            k = "embeddings." + k
        sd["text_model." + k] = np.ascontiguousarray(
            _inverse_transform(leaf, val)
        )
    return sd


# ---------------------------------------------------------------------------
# inverse LDM mapping (test-side oracle for weights/ldm.py)
# ---------------------------------------------------------------------------


def _unet_diffusers_to_ldm(sd, layers):
    p = "model.diffusion_model."
    out = {}
    for k, v in sd.items():
        parts = k.split(".")
        leaf = parts[-1]
        if k.startswith("time_embedding.linear_1."):
            out[f"{p}time_embed.0.{leaf}"] = v
        elif k.startswith("time_embedding.linear_2."):
            out[f"{p}time_embed.2.{leaf}"] = v
        elif k.startswith("conv_in."):
            out[f"{p}input_blocks.0.0.{leaf}"] = v
        elif k.startswith("conv_norm_out."):
            out[f"{p}out.0.{leaf}"] = v
        elif k.startswith("conv_out."):
            out[f"{p}out.2.{leaf}"] = v
        elif parts[0] == "down_blocks":
            b, kind = int(parts[1]), parts[2]
            if kind == "resnets":
                i = 1 + b * (layers + 1) + int(parts[3])
                out[f"{p}input_blocks.{i}.0.{_INV_RESNET[parts[4]]}.{leaf}"] = v
            elif kind == "attentions":
                i = 1 + b * (layers + 1) + int(parts[3])
                out[f"{p}input_blocks.{i}.1.{'.'.join(parts[4:])}"] = v
            elif kind == "downsamplers":
                i = (b + 1) * (layers + 1)
                out[f"{p}input_blocks.{i}.0.op.{leaf}"] = v
            else:
                raise AssertionError(k)
        elif parts[0] == "mid_block":
            if parts[1] == "resnets":
                mod = "0" if parts[2] == "0" else "2"
                out[f"{p}middle_block.{mod}.{_INV_RESNET[parts[3]]}.{leaf}"] = v
            else:  # attentions.0
                out[f"{p}middle_block.1.{'.'.join(parts[3:])}"] = v
        elif parts[0] == "up_blocks":
            b, kind = int(parts[1]), parts[2]
            has_attn = any(
                k2.startswith(f"up_blocks.{b}.attentions.") for k2 in sd
            )
            if kind == "resnets":
                i = b * (layers + 1) + int(parts[3])
                out[f"{p}output_blocks.{i}.0.{_INV_RESNET[parts[4]]}.{leaf}"] = v
            elif kind == "attentions":
                i = b * (layers + 1) + int(parts[3])
                out[f"{p}output_blocks.{i}.1.{'.'.join(parts[4:])}"] = v
            elif kind == "upsamplers":
                i = b * (layers + 1) + layers
                mod = "2" if has_attn else "1"
                out[f"{p}output_blocks.{i}.{mod}.conv.{leaf}"] = v
            else:
                raise AssertionError(k)
        else:
            raise AssertionError(f"unmapped diffusers unet key {k}")
    return out


def _vae_diffusers_to_ldm(sd):
    p = "first_stage_model."
    out = {}
    n_up = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("decoder.up_blocks.")
    )
    for k, v in sd.items():
        parts = k.split(".")
        leaf = parts[-1]
        coder = parts[0]
        if coder in ("quant_conv", "post_quant_conv"):
            out[p + k] = v
        elif parts[1] in ("conv_in", "conv_out"):
            out[p + k] = v
        elif parts[1] == "conv_norm_out":
            out[f"{p}{coder}.norm_out.{leaf}"] = v
        elif parts[1] == "mid_block":
            if parts[2] == "resnets":
                blk = "block_1" if parts[3] == "0" else "block_2"
                out[
                    f"{p}{coder}.mid.{blk}.{_INV_VAE_RESNET[parts[4]]}.{leaf}"
                ] = v
            else:  # attentions.0.<name>.<leaf>, name may be "to_out.0"
                name = ".".join(parts[4:-1])
                src = _INV_VAE_ATTN[name]
                if src != "norm" and leaf == "weight" and v.ndim == 2:
                    v = v.reshape(v.shape[0], v.shape[1], 1, 1)  # dense -> 1x1
                out[f"{p}{coder}.mid.attn_1.{src}.{leaf}"] = v
        elif parts[1] == "down_blocks":
            i = int(parts[2])
            if parts[3] == "resnets":
                out[
                    f"{p}encoder.down.{i}.block.{parts[4]}."
                    f"{_INV_VAE_RESNET[parts[5]]}.{leaf}"
                ] = v
            else:  # downsamplers.0.conv
                out[f"{p}encoder.down.{i}.downsample.conv.{leaf}"] = v
        elif parts[1] == "up_blocks":
            i = n_up - 1 - int(parts[2])  # diffusers top-down -> LDM bottom-up
            if parts[3] == "resnets":
                out[
                    f"{p}decoder.up.{i}.block.{parts[4]}."
                    f"{_INV_VAE_RESNET[parts[5]]}.{leaf}"
                ] = v
            else:  # upsamplers.0.conv
                out[f"{p}decoder.up.{i}.upsample.conv.{leaf}"] = v
        else:
            raise AssertionError(f"unmapped diffusers vae key {k}")
    return out


# ---------------------------------------------------------------------------
# the end-to-end drive
# ---------------------------------------------------------------------------


def _build_model_dir(root):
    """Write the full synthetic checkpoint set; returns probe values."""
    from test_tokenizer import shipped_prompts, train_mini_bpe

    from safetensors import numpy as st_numpy

    torch = pytest.importorskip("torch")

    unet_cfg = _tiny_sd15_unet_cfg()
    vae_cfg = _tiny_sd15_vae_cfg()

    sd_dir = os.path.join(root, "models", "SD")
    # tokenizer: a genuine (small) CLIP-style vocab
    tok_dir = os.path.join(sd_dir, "tokenizer")
    os.makedirs(tok_dir)
    vocab, merges = train_mini_bpe(shipped_prompts())
    with open(os.path.join(tok_dir, "vocab.json"), "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    with open(os.path.join(tok_dir, "merges.txt"), "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    clip_cfg = _tiny_clip_cfg(len(vocab))

    # shape trees (abstract — no FLOPs)
    unet_tree = jax.eval_shape(
        lambda: UNet3DConditionModel(cfg=unet_cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 8, 8, 4)),
            jnp.array([1]),
            jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
        )
    )
    vae_tree = jax.eval_shape(
        lambda: AutoencoderKL(cfg=vae_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 1, 32, 32, 3))
        )
    )
    clip_tree = jax.eval_shape(
        lambda: CLIPTextModel(cfg=clip_cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)
        )
    )

    # base diffusers dir: 2D unet keys (motion modules come from the .ckpt)
    unet_sd = _synth(unet_tree, seed=1)
    base_unet = {k: v for k, v in unet_sd.items() if "motion_modules." not in k}
    motion_sd = {k: v for k, v in unet_sd.items() if "motion_modules." in k}
    for sub, sd in [
        ("unet", base_unet),
        ("vae", _synth(vae_tree, seed=2)),
        ("text_encoder", _clip_hf_sd(clip_tree, seed=3)),
    ]:
        d = os.path.join(sd_dir, sub)
        os.makedirs(d)
        st_numpy.save_file(
            sd, os.path.join(d, "diffusion_pytorch_model.safetensors")
        )

    # per-module diffusers config.json (what from_pretrained reads)
    with open(os.path.join(sd_dir, "unet", "config.json"), "w") as f:
        json.dump(
            {
                "in_channels": 4,
                "out_channels": 4,
                "down_block_types": [
                    "CrossAttnDownBlock2D",
                    "CrossAttnDownBlock2D",
                    "CrossAttnDownBlock2D",
                    "DownBlock2D",
                ],
                "up_block_types": [
                    "UpBlock2D",
                    "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D",
                    "CrossAttnUpBlock2D",
                ],
                "block_out_channels": list(unet_cfg.block_out_channels),
                "layers_per_block": unet_cfg.layers_per_block,
                "norm_num_groups": unet_cfg.norm_num_groups,
                "cross_attention_dim": unet_cfg.cross_attention_dim,
                "attention_head_dim": unet_cfg.attention_head_dim,
            },
            f,
        )
    with open(os.path.join(sd_dir, "vae", "config.json"), "w") as f:
        json.dump(
            {
                "in_channels": 3,
                "out_channels": 3,
                "latent_channels": 4,
                "block_out_channels": list(vae_cfg.block_out_channels),
                "layers_per_block": vae_cfg.layers_per_block,
                "norm_num_groups": vae_cfg.norm_num_groups,
                "scaling_factor": 0.18215,
            },
            f,
        )
    with open(os.path.join(sd_dir, "text_encoder", "config.json"), "w") as f:
        json.dump(
            {
                "vocab_size": clip_cfg.vocab_size,
                "hidden_size": clip_cfg.hidden_size,
                "num_hidden_layers": clip_cfg.num_layers,
                "num_attention_heads": clip_cfg.num_heads,
                "intermediate_size": clip_cfg.intermediate_size,
                "max_position_embeddings": 77,
            },
            f,
        )

    weights_dir = os.path.join(root, "weights")
    os.makedirs(weights_dir)

    # DreamBooth LDM checkpoint: different values than the base, full
    # UNet image-layer + VAE + CLIP inventory in the LDM key layout
    db_unet = _unet_diffusers_to_ldm(
        {k: v for k, v in _synth(unet_tree, seed=4).items()
         if "motion_modules." not in k},
        layers=unet_cfg.layers_per_block,
    )
    db_vae = _vae_diffusers_to_ldm(_synth(vae_tree, seed=5))
    db_clip = {
        "cond_stage_model.transformer." + k: v
        for k, v in _clip_hf_sd(clip_tree, seed=6).items()
    }
    db = {**db_unet, **db_vae, **db_clip}
    st_numpy.save_file(db, os.path.join(weights_dir, "dreambooth.safetensors"))

    # motion module .ckpt (torch format), plus the pos_encoder.pe buffers
    # real AnimateDiff checkpoints carry (the loader must skip them)
    mm = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in motion_sd.items()}
    mm[
        "down_blocks.0.motion_modules.0.temporal_transformer."
        "transformer_blocks.0.attention_blocks.0.pos_encoder.pe"
    ] = torch.zeros(1, 24, 8)
    torch.save(mm, os.path.join(weights_dir, "mm.ckpt"))

    # diffusers-format adapter LoRA on one attention projection
    rng = np.random.default_rng(7)
    lora_up = 0.05 * rng.normal(size=(16, 2)).astype(np.float32)
    lora_down = 0.05 * rng.normal(size=(2, 16)).astype(np.float32)
    lora_target = (
        "up_blocks.1.attentions.0.transformer_blocks.0.attn1"
    )
    st_numpy.save_file(
        {
            f"{lora_target}.processor.to_q_lora.up.weight": lora_up,
            f"{lora_target}.processor.to_q_lora.down.weight": lora_down,
        },
        os.path.join(weights_dir, "adapter_lora.safetensors"),
    )

    # configs
    with open(os.path.join(root, "model_config.yaml"), "w") as f:
        yaml.safe_dump(
            {
                "unet_additional_kwargs": {
                    "use_inflated_groupnorm": True,
                    "use_motion_module": True,
                    "motion_module_resolutions": [1, 2, 4, 8],
                    "motion_module_mid_block": False,
                    "motion_module_kwargs": {
                        "num_attention_heads": 2,
                        "num_transformer_block": 1,
                        "attention_block_types": [
                            "Temporal_Self", "Temporal_Self"
                        ],
                        "temporal_position_encoding": True,
                        "temporal_position_encoding_max_len": 24,
                        "norm_num_groups": 4,
                    },
                },
                "noise_scheduler_kwargs": {
                    "num_train_timesteps": 1000,
                    "beta_start": 0.00085,
                    "beta_end": 0.012,
                    "beta_schedule": "linear",
                    "steps_offset": 1,
                    "clip_sample": False,
                },
            },
            f,
        )
    with open(os.path.join(root, "inference.yaml"), "w") as f:
        yaml.safe_dump(
            {
                "motion_module": "weights/mm.ckpt",
                "dreambooth_path": "weights/dreambooth.safetensors",
                "adapter_lora_path": "weights/adapter_lora.safetensors",
                "adapter_lora_scale": 1.0,
                "model_config": "model_config.yaml",
                "inference_steps": 4,
                "guidance_steps": 2,
                "guidance_scale": 0.3,
                "warm_up_steps": 1,
                "cool_up_steps": 1,
                "motion_guidance_weight": 50.0,
                "motion_guidance_blocks": ["up_blocks.1"],
                "add_noise_step": 400,
                "cfg_scale": 7.5,
                "negative_prompt": "bad quality",
                # the reference's misspelled key (SURVEY §8) must parse
                "postive_prompt": "8k, high detail",
            },
            f,
        )

    mm_key = (
        "up_blocks.1.motion_modules.0.temporal_transformer."
        "transformer_blocks.0.attention_blocks.0.to_q.weight"
    )
    assert mm_key in motion_sd
    probes = {
        "db_conv_in": db_unet["model.diffusion_model.input_blocks.0.0.weight"],
        "db_to_q": db_unet[
            "model.diffusion_model.output_blocks.3.1.transformer_blocks.0"
            ".attn1.to_q.weight"
        ],
        "lora_delta": lora_up @ lora_down,
        "mm_to_q": motion_sd[mm_key],
    }
    return probes


@pytest.mark.filterwarnings("ignore")
def test_cli_synthetic_file_to_mp4(tmp_path, monkeypatch):
    from motionclone_tpu.cli import t2v_main
    from motionclone_tpu.io.video import read_video_frames, write_video

    root = str(tmp_path)
    probes = _build_model_dir(root)

    # a reference video to clone motion from
    frames = np.random.default_rng(0).integers(
        0, 255, size=(6, 64, 64, 3), dtype=np.uint8
    )
    write_video(os.path.join(root, "ref.mp4"), frames, fps=8)
    with open(os.path.join(root, "examples.jsonl"), "w") as f:
        f.write(json.dumps({
            "video_path": "ref.mp4",
            "new_prompt": "a cat running",
            "seed": 42,
        }) + "\n")

    monkeypatch.chdir(root)
    t2v_main([
        "--pretrained-model-path", "models/SD",
        "--inference_config", "inference.yaml",
        "--examples", "examples.jsonl",
        "--motion-representation-save-dir", "reps",
        "--generated-videos-save-dir", "out",
        "--W", "64", "--H", "64", "--L", "4",
        "--float32",
    ])

    # the full path produced a real mp4 with the configured geometry
    outs = glob.glob(os.path.join(root, "out", "*.mp4"))
    assert len(outs) == 1, outs
    got, _fps = read_video_frames(outs[0])
    assert got.shape[0] == 4 and got.shape[1:3] == (64, 64)
    # the reference naming embeds the prompt (with the positive suffix —
    # our loader honors the reference's misspelled YAML key) and both seeds
    name = os.path.basename(outs[0])
    assert name.startswith("ref_a_cat_running") and name.endswith("42_42.mp4")
    # extraction ran and cached the representation
    assert os.path.exists(os.path.join(root, "reps", "ref.npz"))
    # the config snapshot the reference writes next to outputs
    assert os.path.exists(os.path.join(root, "out", "inference_config.json"))


def _build_controlnet(root, flavor):
    """Synthetic SparseCtrl checkpoint + config YAML for the tiny topology.

    ``flavor``: "pixel" (scribble/sketch analog — 3-channel condition
    through the full conv embedding stack, configs/sparsectrl/
    image_condition.yaml) or "latent" (4-channel VAE-encoded condition,
    latent_condition.yaml).  The .ckpt carries the ``pos_encoder.pe``
    buffers real checkpoints have, which the loader must skip
    (reference i2v_video_sample.py:54-59).
    """
    from motionclone_tpu.models.sparse_controlnet import (
        SparseControlNetConfig,
        SparseControlNetModel,
    )

    torch = pytest.importorskip("torch")
    unet_cfg = _tiny_sd15_unet_cfg()
    cn_yaml_kwargs = {
        "set_noisy_sample_input_to_zero": True,
        "use_motion_module": True,
        "motion_module_resolutions": [1, 2, 4, 8],
        "motion_module_mid_block": False,
        "motion_module_kwargs": {
            "num_attention_heads": 2,
            "num_transformer_block": 1,
            "attention_block_types": ["Temporal_Self"],
            "temporal_position_encoding": True,
            "temporal_position_encoding_max_len": 32,
            "norm_num_groups": 4,
        },
    }
    if flavor == "pixel":
        cn_yaml_kwargs.update(
            use_simplified_condition_embedding=False, conditioning_channels=3
        )
    else:
        cn_yaml_kwargs.update(
            use_simplified_condition_embedding=True, conditioning_channels=4
        )
    with open(os.path.join(root, f"sparsectrl_{flavor}.yaml"), "w") as f:
        yaml.safe_dump({"controlnet_additional_kwargs": cn_yaml_kwargs}, f)

    cn_cfg = SparseControlNetConfig.from_yaml_dict(cn_yaml_kwargs, unet_cfg)
    cond_hw = 8 if cn_cfg.use_simplified_condition_embedding else 8 * (
        2 ** (len(cn_cfg.conditioning_embedding_out_channels) - 1)
    )
    cn_tree = jax.eval_shape(
        lambda: SparseControlNetModel(cfg=cn_cfg).init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 2, 8, 8, cn_cfg.in_channels)),
            jnp.array([1]),
            jnp.zeros((1, 77, cn_cfg.cross_attention_dim)),
            jnp.zeros((1, 2, cond_hw, cond_hw, cn_cfg.conditioning_channels)),
            jnp.zeros((1, 2, cond_hw, cond_hw, 1)),
        )
    )
    cn_sd = _synth(cn_tree, seed=11)
    ckpt = {
        k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in cn_sd.items()
    }
    ckpt[
        "down_blocks.0.motion_modules.0.temporal_transformer."
        "transformer_blocks.0.attention_blocks.0.pos_encoder.pe"
    ] = torch.zeros(1, 32, 8)
    path = os.path.join(root, "weights", f"sparsectrl_{flavor}.ckpt")
    torch.save(ckpt, path)
    return path


@pytest.mark.filterwarnings("ignore")
@pytest.mark.parametrize("flavor", ["pixel", "latent"])
def test_cli_synthetic_i2v_file_to_mp4(tmp_path, monkeypatch, flavor):
    """The i2v CLI end-to-end on synthetic files: SparseCtrl checkpoint
    load (pos_encoder filtering + strict validation), condition-image
    loading + frame scatter, per-step controlnet forwards inside the
    guided and vanilla phases, through to a real mp4 — the file-level
    drive of the reference's i2v_video_sample.py:16-137 flow for both
    conditioning flavors (pixel=sketch workload, latent=rgb workload)."""
    from PIL import Image

    from motionclone_tpu.cli import i2v_main
    from motionclone_tpu.io.video import read_video_frames, write_video

    root = str(tmp_path)
    _build_model_dir(root)
    cn_path = _build_controlnet(root, flavor)

    frames = np.random.default_rng(0).integers(
        0, 255, size=(6, 64, 64, 3), dtype=np.uint8
    )
    write_video(os.path.join(root, "ref.mp4"), frames, fps=8)
    img = np.random.default_rng(1).integers(
        0, 255, size=(64, 64, 3), dtype=np.uint8
    )
    Image.fromarray(img).save(os.path.join(root, "cond.png"))
    with open(os.path.join(root, "examples.jsonl"), "w") as f:
        f.write(json.dumps({
            "video_path": "ref.mp4",
            "new_prompt": "a cat running",
            "condition_image_paths": ["cond.png"],
            "image_index": [0],
            "seed": 42,
        }) + "\n")

    # extend the shared inference yaml with the controlnet entries
    with open(os.path.join(root, "inference.yaml")) as f:
        infer = yaml.safe_load(f)
    infer["controlnet_config"] = f"sparsectrl_{flavor}.yaml"
    infer["controlnet_path"] = os.path.relpath(cn_path, root)
    with open(os.path.join(root, "inference_i2v.yaml"), "w") as f:
        yaml.safe_dump(infer, f)

    monkeypatch.chdir(root)
    i2v_main([
        "--pretrained-model-path", "models/SD",
        "--inference_config", "inference_i2v.yaml",
        "--examples", "examples.jsonl",
        "--motion-representation-save-dir", "reps",
        "--generated-videos-save-dir", "out",
        "--W", "64", "--H", "64", "--L", "4",
        "--float32",
    ])

    outs = glob.glob(os.path.join(root, "out", "*.mp4"))
    assert len(outs) == 1, outs
    got, _fps = read_video_frames(outs[0])
    assert got.shape[0] == 4 and got.shape[1:3] == (64, 64)
    assert os.path.exists(os.path.join(root, "reps", "ref.npz"))


@pytest.mark.filterwarnings("ignore")
def test_synthetic_weights_override_chain(tmp_path, monkeypatch):
    """The loaded parameters reflect the whole merge chain: DreamBooth LDM
    values override the diffusers base, the motion .ckpt fills the motion
    modules, and the adapter LoRA delta lands on its target projection
    (reference util.py:142-213)."""
    from motionclone_tpu.config import load_inference_config
    from motionclone_tpu.pipeline.runner import MotionCloneRuntime

    root = str(tmp_path)
    probes = _build_model_dir(root)
    monkeypatch.chdir(root)
    cfg = load_inference_config(
        "inference.yaml", width=64, height=64, video_length=4
    )
    rt = MotionCloneRuntime(
        "models/SD", cfg, dtype=jnp.float32, config_root="."
    )
    params = rt.pipeline.params["params"]

    # DreamBooth overrides the base (conv_in: OIHW -> HWIO transpose)
    np.testing.assert_allclose(
        np.asarray(params["conv_in"]["kernel"]),
        probes["db_conv_in"].transpose(2, 3, 1, 0),
        rtol=1e-6,
    )
    # LoRA delta on top of the DreamBooth value (output_blocks.3 == the
    # first attention of up_blocks.1 at layers_per_block=2)
    got_q = np.asarray(
        params["up_blocks_1"]["attentions_0"]["transformer_blocks_0"][
            "attn1"
        ]["to_q"]["kernel"]
    )
    np.testing.assert_allclose(
        got_q, (probes["db_to_q"] + probes["lora_delta"]).T,
        rtol=1e-5, atol=1e-7,
    )
    # motion modules come from the .ckpt (never touched by the DreamBooth)
    got_mm = np.asarray(
        params["up_blocks_1"]["motion_modules_0"]["temporal_transformer"][
            "transformer_blocks_0"
        ]["attention_blocks_0"]["to_q"]["kernel"]
    )
    np.testing.assert_allclose(got_mm, probes["mm_to_q"].T, rtol=1e-6)
