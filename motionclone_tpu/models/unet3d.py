"""UNet3DConditionModel: the AnimateDiff SD1.5 UNet, TPU-native.

Rebuild of reference unet.py:38-515 plus the customized forward variants of
motionclone_functions.py:478-662, expressed structurally instead of by
monkey-patching:

* temporal-attention probabilities for ``guidance_blocks`` are returned as an
  explicit auxiliary output (replacing the recorder hooks);
* the extraction early-exit (``only_motion_feature``,
  motionclone_functions.py:627-628) is the static ``max_up_block`` argument;
* the reference's no-grad split after the last guidance block
  (motionclone_functions.py:629) needs no analog: under ``jax.grad`` of the
  guidance loss the later up-blocks are not on the differentiation path, so
  XLA stores no residuals for them.

Activations are channels-last video tensors (B, F, H, W, C); latents are
(B, F, 64, 64, 4) for 512x512 generation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionclone_tpu.config import UNet3DConfig
from motionclone_tpu.models.embeddings import TimestepEmbedding, timestep_embedding
from motionclone_tpu.models.layers import (
    conv2d,
    group_norm,
    make_group_norm,
    spatial_conv,
)
from motionclone_tpu.models.unet_blocks import (
    CrossAttnDownBlock3D,
    CrossAttnUpBlock3D,
    DownBlock3D,
    UNetMidBlock3DCrossAttn,
    UpBlock3D,
)

ProbsDict = Dict[str, jnp.ndarray]


class UNet3DConditionModel(nn.Module):
    """``post_guidance_cut``: index of the last guidance up block; when set,
    later up blocks run under ``stop_gradient`` with ``post_guidance_impl``
    kernels.  The guidance loss reads only the probs emitted at or before the
    cut, so this changes no value and no gradient — it is the structural
    analog of the reference's post-guidance ``torch.no_grad()`` split
    (motionclone_functions.py:629-652), and it lets the differentiated UNet
    run the forward-only fused Pallas kernels for the tail of the network.
    """

    cfg: UNet3DConfig
    guidance_blocks: Tuple[str, ...] = ()
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    post_guidance_cut: Optional[int] = None
    post_guidance_impl: str = "fused"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, F, H, W, C_in)
        timesteps: jnp.ndarray,  # scalar or (B,)
        encoder_hidden_states: jnp.ndarray,  # (B, 77, cross_attention_dim)
        down_block_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_block_residual: Optional[jnp.ndarray] = None,
        max_up_block: Optional[int] = None,
    ) -> Tuple[Optional[jnp.ndarray], ProbsDict]:
        """Returns ``(noise_pred, probs)``.

        ``max_up_block``: static; if set, run only up blocks ``0..max_up_block``
        and return ``noise_pred=None`` — the extraction fast path
        (reference motionclone_functions.py:601-628).
        """
        cfg = self.cfg
        probs: ProbsDict = {}
        sample = sample.astype(self.dtype)
        encoder_hidden_states = encoder_hidden_states.astype(self.dtype)

        # --- time embedding (unet.py:370-392)
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift
        ).astype(self.dtype)
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb)

        # --- conv_in
        x = spatial_conv(
            sample, conv2d(cfg.block_out_channels[0], name="conv_in", dtype=self.dtype)
        )

        # --- down blocks
        skips = [x]
        out_ch = cfg.block_out_channels[0]
        for i, block_type in enumerate(cfg.down_block_types):
            res = 2**i
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.block_out_channels) - 1
            use_mm = (
                cfg.use_motion_module
                and (res in cfg.motion_module_resolutions)
                and (not cfg.motion_module_decoder_only)
            )
            common = dict(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                add_downsample=not is_final,
                use_inflated_groupnorm=cfg.use_inflated_groupnorm,
                use_motion_module=use_mm,
                motion_module_cfg=cfg.motion_module,
                path=f"down_blocks.{i}",
                guidance_blocks=self.guidance_blocks,
                attention_impl=self.attention_impl,
                frames_axis=self.frames_axis,
                dtype=self.dtype,
            )
            if block_type == "CrossAttnDownBlock3D":
                x, block_skips, p = CrossAttnDownBlock3D(
                    heads=cfg.num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    use_linear_projection=cfg.use_linear_projection,
                    name=f"down_blocks_{i}",
                    **common,
                )(x, temb, encoder_hidden_states)
            elif block_type == "DownBlock3D":
                x, block_skips, p = DownBlock3D(name=f"down_blocks_{i}", **common)(
                    x, temb
                )
            else:
                raise ValueError(f"unknown down block type: {block_type}")
            skips.extend(block_skips)
            probs.update(p)

        # --- controlnet residual injection (unet.py:422-428)
        if down_block_residuals is not None:
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_block_residuals)]

        # --- mid block
        x, p = UNetMidBlock3DCrossAttn(
            channels=cfg.block_out_channels[-1],
            num_layers=1,
            heads=cfg.num_heads,
            cross_attention_dim=cfg.cross_attention_dim,
            norm_num_groups=cfg.norm_num_groups,
            norm_eps=cfg.norm_eps,
            use_inflated_groupnorm=cfg.use_inflated_groupnorm,
            use_motion_module=cfg.use_motion_module and cfg.motion_module_mid_block,
            motion_module_cfg=cfg.motion_module,
            use_linear_projection=cfg.use_linear_projection,
            path="mid_block",
            guidance_blocks=self.guidance_blocks,
            attention_impl=self.attention_impl,
            frames_axis=self.frames_axis,
            dtype=self.dtype,
            name="mid_block",
        )(x, temb, encoder_hidden_states)
        probs.update(p)

        if mid_block_residual is not None:
            x = x + mid_block_residual.astype(x.dtype)

        # --- up blocks
        reversed_ch = list(reversed(cfg.block_out_channels))
        num_up = len(cfg.up_block_types)
        for i, block_type in enumerate(cfg.up_block_types):
            if max_up_block is not None and i > max_up_block:
                return None, probs  # extraction early exit
            res = 2 ** (3 - i)
            out_ch = reversed_ch[i]
            is_final = i == num_up - 1
            num_layers = cfg.layers_per_block + 1
            block_skips = tuple(skips[-num_layers:])
            del skips[-num_layers:]
            use_mm = cfg.use_motion_module and (res in cfg.motion_module_resolutions)
            post_cut = (
                self.post_guidance_cut is not None and i > self.post_guidance_cut
            )
            if post_cut:
                x = jax.lax.stop_gradient(x)
                block_skips = tuple(
                    jax.lax.stop_gradient(s) for s in block_skips
                )
            common = dict(
                out_channels=out_ch,
                num_layers=num_layers,
                norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps,
                add_upsample=not is_final,
                use_inflated_groupnorm=cfg.use_inflated_groupnorm,
                use_motion_module=use_mm,
                motion_module_cfg=cfg.motion_module,
                path=f"up_blocks.{i}",
                guidance_blocks=self.guidance_blocks,
                attention_impl=(
                    self.post_guidance_impl if post_cut else self.attention_impl
                ),
                frames_axis=self.frames_axis,
                dtype=self.dtype,
            )
            if block_type == "CrossAttnUpBlock3D":
                x, p = CrossAttnUpBlock3D(
                    heads=cfg.num_heads,
                    cross_attention_dim=cfg.cross_attention_dim,
                    use_linear_projection=cfg.use_linear_projection,
                    name=f"up_blocks_{i}",
                    **common,
                )(x, block_skips, temb, encoder_hidden_states)
            elif block_type == "UpBlock3D":
                x, p = UpBlock3D(name=f"up_blocks_{i}", **common)(x, block_skips, temb)
            else:
                raise ValueError(f"unknown up block type: {block_type}")
            probs.update(p)

        # --- out head
        x = group_norm(
            x,
            make_group_norm(cfg.norm_num_groups, cfg.norm_eps, name="conv_norm_out"),
            per_frame=cfg.use_inflated_groupnorm,
        )
        x = nn.silu(x)
        x = spatial_conv(
            x, conv2d(cfg.out_channels, name="conv_out", dtype=self.dtype)
        )
        return x, probs
