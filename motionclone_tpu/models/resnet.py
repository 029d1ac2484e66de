"""ResnetBlock3D: the UNet's conv backbone block.

Rebuild of reference resnet.py:109-213 in channels-last video layout.
Parameter paths mirror the diffusers state-dict keys: ``norm1``, ``conv1``,
``time_emb_proj``, ``norm2``, ``conv2``, ``conv_shortcut``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from motionclone_tpu.models.layers import (
    conv2d,
    group_norm,
    make_group_norm,
    spatial_conv,
)


class ResnetBlock3D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_inflated_groupnorm: bool = True
    time_embedding_norm: str = "default"  # or "scale_shift"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        in_channels = x.shape[-1]
        residual = x

        h = group_norm(
            x,
            make_group_norm(self.groups, self.eps, name="norm1"),
            per_frame=self.use_inflated_groupnorm,
        )
        h = nn.silu(h)
        h = spatial_conv(h, conv2d(self.out_channels, name="conv1", dtype=self.dtype))

        scale_shift = None
        if temb is not None:
            t_out = self.out_channels * (2 if self.time_embedding_norm == "scale_shift" else 1)
            t = nn.Dense(t_out, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            t = t[:, None, None, None, :]  # broadcast over (F, H, W)
            if self.time_embedding_norm == "default":
                h = h + t
            else:
                scale_shift = jnp.split(t, 2, axis=-1)

        h = group_norm(
            h,
            make_group_norm(self.groups, self.eps, name="norm2"),
            per_frame=self.use_inflated_groupnorm,
        )
        if scale_shift is not None:
            scale, shift = scale_shift
            h = h * (1 + scale) + shift

        h = nn.silu(h)
        h = spatial_conv(h, conv2d(self.out_channels, name="conv2", dtype=self.dtype))

        use_shortcut = (
            in_channels != self.out_channels
            if self.use_in_shortcut is None
            else self.use_in_shortcut
        )
        if use_shortcut:
            residual = spatial_conv(
                residual,
                conv2d(
                    self.out_channels,
                    kernel=1,
                    padding=0,
                    name="conv_shortcut",
                    dtype=self.dtype,
                ),
            )
        return (residual + h) / self.output_scale_factor
