"""UNet3D down/mid/up blocks.

Rebuild of reference unet_blocks.py.  Layer ordering per block layer:

* down (cross-attn):  resnet -> spatial transformer -> motion module
  (unet_blocks.py:407-411)
* down (plain):       resnet -> motion module (unet_blocks.py:508-512)
* mid:                resnet0 then [attn -> motion -> resnet] x N
  (unet_blocks.py:271-278)
* up (cross-attn):    concat skip -> resnet -> attn -> motion
  (unet_blocks.py:630-661)
* up (plain):         concat skip -> resnet -> motion (unet_blocks.py:735-756)

Each block returns a dict of temporal-attention probability maps for motion
modules whose reference-style dotted path matches a ``guidance_blocks``
substring (the reference's ``classify_blocks`` matching, util.py:434-440).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from motionclone_tpu.config import MotionModuleConfig
from motionclone_tpu.models.attention import Transformer3DModel
from motionclone_tpu.models.layers import Downsample, Upsample
from motionclone_tpu.models.motion_module import VanillaTemporalModule
from motionclone_tpu.models.resnet import ResnetBlock3D

ProbsDict = Dict[str, jnp.ndarray]


def match_guidance(path: str, guidance_blocks: Tuple[str, ...]) -> bool:
    """Substring matching, as the reference's classify_blocks (util.py:434-440)."""
    return any(g in path for g in guidance_blocks)


def _probs_keys(mm_path: str, cfg: MotionModuleConfig) -> Tuple[str, ...]:
    """VersatileAttention module names, in the flattened emission order of
    TemporalTransformer3D (transformer block major, attention block minor)."""
    keys = []
    for i in range(cfg.num_transformer_block):
        for k in range(len(cfg.attention_block_types)):
            keys.append(
                f"{mm_path}.temporal_transformer.transformer_blocks.{i}"
                f".attention_blocks.{k}"
            )
    return tuple(keys)


def _run_motion_module(
    parent: nn.Module,
    x: jnp.ndarray,
    idx: int,
    path: str,
    mm_cfg: MotionModuleConfig,
    guidance_blocks: Tuple[str, ...],
    dtype: jnp.dtype,
) -> Tuple[jnp.ndarray, ProbsDict]:
    mm_path = f"{path}.motion_modules.{idx}"
    collect = match_guidance(mm_path, guidance_blocks)
    attention_impl = getattr(parent, "attention_impl", "auto")
    frames_axis = getattr(parent, "frames_axis", None)
    # invoked from the parent's compact __call__, so the ambient scope
    # registers the module under the parent
    del parent
    x, probs = VanillaTemporalModule(
        cfg=mm_cfg, attention_impl=attention_impl, frames_axis=frames_axis,
        dtype=dtype, name=f"motion_modules_{idx}"
    )(x, return_probs=collect)
    out: ProbsDict = {}
    if collect:
        for key, p in zip(_probs_keys(mm_path, mm_cfg), probs):
            out[key] = p
    return x, out


class CrossAttnDownBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    add_downsample: bool
    use_inflated_groupnorm: bool
    use_motion_module: bool
    motion_module_cfg: Optional[MotionModuleConfig]
    use_linear_projection: bool = False
    path: str = ""
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: jnp.ndarray, context: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], ProbsDict]:
        skips = []
        probs: ProbsDict = {}
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                out_channels=self.out_channels,
                groups=self.norm_num_groups,
                eps=self.norm_eps,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer3DModel(
                heads=self.heads,
                dim_head=self.out_channels // self.heads,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups,
                use_linear_projection=self.use_linear_projection,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
            if self.use_motion_module:
                x, p = _run_motion_module(
                    self, x, i, self.path, self.motion_module_cfg,
                    self.guidance_blocks, self.dtype,
                )
                probs.update(p)
            skips.append(x)

        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, tuple(skips), probs


class DownBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    norm_num_groups: int
    norm_eps: float
    add_downsample: bool
    use_inflated_groupnorm: bool
    use_motion_module: bool
    motion_module_cfg: Optional[MotionModuleConfig]
    path: str = ""
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...], ProbsDict]:
        skips = []
        probs: ProbsDict = {}
        for i in range(self.num_layers):
            x = ResnetBlock3D(
                out_channels=self.out_channels,
                groups=self.norm_num_groups,
                eps=self.norm_eps,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.use_motion_module:
                x, p = _run_motion_module(
                    self, x, i, self.path, self.motion_module_cfg,
                    self.guidance_blocks, self.dtype,
                )
                probs.update(p)
            skips.append(x)

        if self.add_downsample:
            x = Downsample(self.out_channels, dtype=self.dtype, name="downsamplers_0")(x)
            skips.append(x)
        return x, tuple(skips), probs


class UNetMidBlock3DCrossAttn(nn.Module):
    channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    use_inflated_groupnorm: bool
    use_motion_module: bool
    motion_module_cfg: Optional[MotionModuleConfig]
    use_linear_projection: bool = False
    path: str = "mid_block"
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, temb: jnp.ndarray, context: jnp.ndarray
    ) -> Tuple[jnp.ndarray, ProbsDict]:
        probs: ProbsDict = {}
        x = ResnetBlock3D(
            out_channels=self.channels,
            groups=self.norm_num_groups,
            eps=self.norm_eps,
            use_inflated_groupnorm=self.use_inflated_groupnorm,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name="resnets_0",
        )(x, temb)
        for i in range(self.num_layers):
            x = Transformer3DModel(
                heads=self.heads,
                dim_head=self.channels // self.heads,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups,
                use_linear_projection=self.use_linear_projection,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
            if self.use_motion_module:
                x, p = _run_motion_module(
                    self, x, i, self.path, self.motion_module_cfg,
                    self.guidance_blocks, self.dtype,
                )
                probs.update(p)
            x = ResnetBlock3D(
                out_channels=self.channels,
                groups=self.norm_num_groups,
                eps=self.norm_eps,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"resnets_{i + 1}",
            )(x, temb)
        return x, probs


class CrossAttnUpBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    heads: int
    cross_attention_dim: int
    norm_num_groups: int
    norm_eps: float
    add_upsample: bool
    use_inflated_groupnorm: bool
    use_motion_module: bool
    motion_module_cfg: Optional[MotionModuleConfig]
    use_linear_projection: bool = False
    path: str = ""
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Tuple[jnp.ndarray, ...],
        temb: jnp.ndarray,
        context: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, ProbsDict]:
        probs: ProbsDict = {}
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock3D(
                out_channels=self.out_channels,
                groups=self.norm_num_groups,
                eps=self.norm_eps,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            x = Transformer3DModel(
                heads=self.heads,
                dim_head=self.out_channels // self.heads,
                cross_attention_dim=self.cross_attention_dim,
                norm_num_groups=self.norm_num_groups,
                use_linear_projection=self.use_linear_projection,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"attentions_{i}",
            )(x, context)
            if self.use_motion_module:
                x, p = _run_motion_module(
                    self, x, i, self.path, self.motion_module_cfg,
                    self.guidance_blocks, self.dtype,
                )
                probs.update(p)

        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x, probs


class UpBlock3D(nn.Module):
    out_channels: int
    num_layers: int
    norm_num_groups: int
    norm_eps: float
    add_upsample: bool
    use_inflated_groupnorm: bool
    use_motion_module: bool
    motion_module_cfg: Optional[MotionModuleConfig]
    path: str = ""
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        skips: Tuple[jnp.ndarray, ...],
        temb: jnp.ndarray,
    ) -> Tuple[jnp.ndarray, ProbsDict]:
        probs: ProbsDict = {}
        skips = list(skips)
        for i in range(self.num_layers):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = ResnetBlock3D(
                out_channels=self.out_channels,
                groups=self.norm_num_groups,
                eps=self.norm_eps,
                use_inflated_groupnorm=self.use_inflated_groupnorm,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"resnets_{i}",
            )(x, temb)
            if self.use_motion_module:
                x, p = _run_motion_module(
                    self, x, i, self.path, self.motion_module_cfg,
                    self.guidance_blocks, self.dtype,
                )
                probs.update(p)

        if self.add_upsample:
            x = Upsample(self.out_channels, dtype=self.dtype, name="upsamplers_0")(x)
        return x, probs
