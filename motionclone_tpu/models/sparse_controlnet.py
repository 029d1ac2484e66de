"""SparseControlNet: sparse-frame image conditioning (AnimateDiff SparseCtrl).

Rebuild of reference sparse_controlnet.py:49-593 in channels-last video
layout.  The model is the UNet3D's down+mid half with:

* a conditioning embedding — either a zero-initialized single conv over
  latent-space conditions ("simplified", RGB workload,
  configs/sparsectrl/latent_condition.yaml) or a strided conv stack over
  pixel-space conditions (scribble workload, image_condition.yaml);
* a conditioning mask channel concatenated to the condition
  (sparse_controlnet.py:176-178, 522-523) — the caller scatters condition
  frames into a zeros tensor and sets the mask at those frame indices;
* ``set_noisy_sample_input_to_zero``: the latent input is replaced by
  conv_in's bias broadcast (sparse_controlnet.py:516-518) — implemented
  here, exactly equivalently, as conv_in applied to zeros;
* per-resolution zero-conv output heads (``controlnet_down_blocks`` /
  ``controlnet_mid_block``) scaled by ``conditioning_scale``;
* its own 1-attention-block motion modules with PE max_len 32
  (sparse_controlnet.py:126-134).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from motionclone_tpu.config import MotionModuleConfig, UNet3DConfig
from motionclone_tpu.models.embeddings import TimestepEmbedding, timestep_embedding
from motionclone_tpu.models.layers import conv2d, spatial_conv
from motionclone_tpu.models.unet_blocks import (
    CrossAttnDownBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
)


@dataclasses.dataclass(frozen=True)
class SparseControlNetConfig:
    in_channels: int = 4
    conditioning_channels: int = 3
    concate_conditioning_mask: bool = True
    use_simplified_condition_embedding: bool = False
    set_noisy_sample_input_to_zero: bool = False
    conditioning_embedding_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "CrossAttnDownBlock3D",
        "DownBlock3D",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 768
    num_heads: int = 8
    use_motion_module: bool = True
    motion_module_resolutions: Tuple[int, ...] = (1, 2, 4, 8)
    motion_module_mid_block: bool = False
    motion_module: MotionModuleConfig = MotionModuleConfig(
        attention_block_types=("Temporal_Self",),
        temporal_position_encoding_max_len=32,
    )

    @classmethod
    def from_yaml_dict(
        cls, d: dict, unet_cfg: Optional[UNet3DConfig] = None
    ) -> "SparseControlNetConfig":
        """Build from a sparsectrl YAML's ``controlnet_additional_kwargs``
        on top of the base UNet topology (reference ``from_unet``,
        sparse_controlnet.py:316-352)."""
        kwargs: dict = {}
        if unet_cfg is not None:
            kwargs.update(
                block_out_channels=unet_cfg.block_out_channels,
                layers_per_block=unet_cfg.layers_per_block,
                norm_num_groups=unet_cfg.norm_num_groups,
                norm_eps=unet_cfg.norm_eps,
                cross_attention_dim=unet_cfg.cross_attention_dim,
                num_heads=unet_cfg.num_heads,
                in_channels=unet_cfg.in_channels,
            )
        for key in (
            "conditioning_channels",
            "concate_conditioning_mask",
            "use_simplified_condition_embedding",
            "set_noisy_sample_input_to_zero",
            "use_motion_module",
            "motion_module_mid_block",
        ):
            if key in d:
                kwargs[key] = d[key]
        if "motion_module_resolutions" in d:
            kwargs["motion_module_resolutions"] = tuple(d["motion_module_resolutions"])
        if "motion_module_kwargs" in d:
            kwargs["motion_module"] = MotionModuleConfig.from_dict(
                d["motion_module_kwargs"]
            )
        return cls(**kwargs)


class ConditioningEmbedding(nn.Module):
    """Strided conv stack: pixel-space condition -> latent-res features
    (sparse_controlnet.py:49-82).  Downsamples 2^(len(blocks)-1)."""

    out_channels: int
    block_out_channels: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        x = spatial_conv(
            cond, conv2d(self.block_out_channels[0], name="conv_in", dtype=self.dtype)
        )
        x = nn.silu(x)
        for i in range(len(self.block_out_channels) - 1):
            x = spatial_conv(
                x,
                conv2d(
                    self.block_out_channels[i],
                    name=f"blocks_{2 * i}",
                    dtype=self.dtype,
                ),
            )
            x = nn.silu(x)
            x = spatial_conv(
                x,
                conv2d(
                    self.block_out_channels[i + 1],
                    stride=2,
                    name=f"blocks_{2 * i + 1}",
                    dtype=self.dtype,
                ),
            )
            x = nn.silu(x)
        zero = dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
        return spatial_conv(
            x,
            nn.Conv(
                self.out_channels,
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                dtype=self.dtype,
                name="conv_out",
                **zero,
            ),
        )


class SparseControlNetModel(nn.Module):
    cfg: SparseControlNetConfig
    attention_impl: str = "auto"
    # mesh axis the frame dimension is sharded over inside jax.shard_map
    # (same contract as UNet3DConditionModel.frames_axis): the controlnet's
    # own temporal modules (reference sparse_controlnet.py:122-134) then
    # all_gather K/V across the frame shards
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, h, w, 4) noisy latents
        timesteps: jnp.ndarray,
        encoder_hidden_states: jnp.ndarray,  # (B or 1, 77, D)
        controlnet_cond: jnp.ndarray,  # (B, F, H', W', C_cond)
        conditioning_mask: Optional[jnp.ndarray],  # (B, F, H', W', 1)
        conditioning_scale: float = 1.0,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        cfg = self.cfg
        zero = dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
        sample = sample.astype(self.dtype)
        b = sample.shape[0]
        if encoder_hidden_states.shape[0] != b:
            encoder_hidden_states = jnp.repeat(
                encoder_hidden_states, b // encoder_hidden_states.shape[0], axis=0
            )
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        # time embedding
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (b,))
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0]).astype(
            self.dtype
        )
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb)

        # input: conv_in(sample) or, when set_noisy_sample_input_to_zero, the
        # bias broadcast == conv_in(zeros) (sparse_controlnet.py:516-518)
        conv_in = conv2d(cfg.block_out_channels[0], name="conv_in", dtype=self.dtype)
        if cfg.set_noisy_sample_input_to_zero:
            x = spatial_conv(jnp.zeros_like(sample), conv_in)
        else:
            x = spatial_conv(sample, conv_in)

        # conditioning embedding
        cond = controlnet_cond.astype(self.dtype)
        if cfg.concate_conditioning_mask:
            assert conditioning_mask is not None
            cond = jnp.concatenate(
                [cond, conditioning_mask.astype(self.dtype)], axis=-1
            )
        if cfg.use_simplified_condition_embedding:
            cond_emb = spatial_conv(
                cond,
                nn.Conv(
                    cfg.block_out_channels[0],
                    kernel_size=(3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    name="controlnet_cond_embedding",
                    **zero,
                ),
            )
        else:
            cond_emb = ConditioningEmbedding(
                out_channels=cfg.block_out_channels[0],
                block_out_channels=cfg.conditioning_embedding_out_channels,
                dtype=self.dtype,
                name="controlnet_cond_embedding",
            )(cond)
        x = x + cond_emb

        # down blocks (same topology as the UNet's; no probs collected)
        skips = [x]
        for i, block_type in enumerate(cfg.down_block_types):
            res = 2**i
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            use_mm = cfg.use_motion_module and (res in cfg.motion_module_resolutions)
            common = dict(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                add_downsample=not is_final,
                use_inflated_groupnorm=True,  # hardcoded in reference (:272)
                use_motion_module=use_mm,
                motion_module_cfg=cfg.motion_module,
                path=f"down_blocks.{i}",
                guidance_blocks=(),
                frames_axis=self.frames_axis,
                dtype=self.dtype,
            )
            if block_type == "CrossAttnDownBlock3D":
                x, block_skips, _ = CrossAttnDownBlock3D(
                    heads=cfg.num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    attention_impl=self.attention_impl,
                    name=f"down_blocks_{i}",
                    **common,
                )(x, temb, encoder_hidden_states)
            else:
                x, block_skips, _ = DownBlock3D(name=f"down_blocks_{i}", **common)(
                    x, temb
                )
            skips.extend(block_skips)

        x, _ = UNetMidBlock3DCrossAttn(
            channels=cfg.block_out_channels[-1],
            num_layers=1,
            heads=cfg.num_heads,
            cross_attention_dim=cfg.cross_attention_dim,
            norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps,
            use_inflated_groupnorm=True,
            use_motion_module=cfg.use_motion_module and cfg.motion_module_mid_block,
            motion_module_cfg=cfg.motion_module,
            attention_impl=self.attention_impl,
            frames_axis=self.frames_axis,
            dtype=self.dtype,
            name="mid_block",
        )(x, temb, encoder_hidden_states)

        # zero-conv output heads
        down_res = []
        for i, skip in enumerate(skips):
            head = nn.Conv(
                skip.shape[-1],
                kernel_size=(1, 1),
                dtype=self.dtype,
                name=f"controlnet_down_blocks_{i}",
                **zero,
            )
            down_res.append(spatial_conv(skip, head) * conditioning_scale)
        mid_head = nn.Conv(
            x.shape[-1],
            kernel_size=(1, 1),
            dtype=self.dtype,
            name="controlnet_mid_block",
            **zero,
        )
        mid_res = spatial_conv(x, mid_head) * conditioning_scale
        return tuple(down_res), mid_res


def scatter_condition(
    condition_frames: jnp.ndarray,  # (B, N, H, W, C) condition images/latents
    image_index: Tuple[int, ...],
    video_length: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Zeros + scatter of conditions onto conditioned frame indices plus a
    1-channel mask (reference motionclone_functions.py:54-63, 178-188)."""
    b, n, h, w, c = condition_frames.shape
    assert n == len(image_index)
    cond = jnp.zeros((b, video_length, h, w, c), condition_frames.dtype)
    mask = jnp.zeros((b, video_length, h, w, 1), condition_frames.dtype)
    idx = jnp.asarray(image_index)
    cond = cond.at[:, idx].set(condition_frames)
    mask = mask.at[:, idx].set(1.0)
    return cond, mask
