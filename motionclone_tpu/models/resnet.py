"""ResnetBlock3D: the UNet's conv backbone block.

Rebuild of reference resnet.py:109-213 in channels-last video layout.
Parameter paths mirror the diffusers state-dict keys: ``norm1``, ``conv1``,
``time_emb_proj``, ``norm2``, ``conv2``, ``conv_shortcut``.

With ``attention_impl="fused"`` (non-differentiated UNet passes on TPU) the
whole block runs as one per-frame Pallas kernel (ops/fused_resnet.py): one
HBM read of the activation instead of ~10 elementwise/conv passes.  Init
always runs the unfused path so the parameter tree (and checkpoints) are
identical either way.
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
from motionclone_tpu.ops.fused_resnet import (
    ResnetWeights,
    fused_resnet_block,
    supported as fused_resnet_supported,
)


class ResnetBlock3D(nn.Module):
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    use_inflated_groupnorm: bool = True
    time_embedding_norm: str = "default"  # or "scale_shift"
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    attention_impl: str = "auto"  # "fused" routes through the Pallas kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        in_channels = x.shape[-1]
        residual = x

        use_shortcut = (
            in_channels != self.out_channels
            if self.use_in_shortcut is None
            else self.use_in_shortcut
        )

        if (
            self.attention_impl == "fused"
            and not self.is_initializing()
            and self.use_inflated_groupnorm
            and self.output_scale_factor == 1.0
            and fused_resnet_supported(
                x.shape, self.out_channels, self.groups,
                self.time_embedding_norm,
                itemsize=jnp.dtype(self.dtype).itemsize,
            )
        ):
            t_out = None
            if temb is not None:
                t_out = nn.Dense(
                    self.out_channels, dtype=self.dtype, name="time_emb_proj"
                )(nn.silu(temb))
            p = lambda name: self.get_variable("params", name)
            w = ResnetWeights(
                gn1_scale=p("norm1")["scale"],
                gn1_bias=p("norm1")["bias"],
                w1=p("conv1")["kernel"].reshape(9 * in_channels, self.out_channels),
                b1=p("conv1")["bias"],
                gn2_scale=p("norm2")["scale"],
                gn2_bias=p("norm2")["bias"],
                w2=p("conv2")["kernel"].reshape(9 * self.out_channels, self.out_channels),
                b2=p("conv2")["bias"],
                wsc=p("conv_shortcut")["kernel"].reshape(in_channels, self.out_channels)
                if use_shortcut
                else None,
                bsc=p("conv_shortcut")["bias"] if use_shortcut else None,
            )
            return fused_resnet_block(
                x.astype(self.dtype), t_out, w, groups=self.groups, eps=self.eps
            )

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
