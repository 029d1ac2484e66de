"""Video-tensor primitives in channels-last layout.

The canonical activation layout throughout this framework is
``(batch, frames, height, width, channels)`` — channels-last so XLA:TPU maps
convolutions directly onto the MXU without layout transposes.  The
reference's "inflated" primitives (reference resnet.py:10-29) fold frames
into the batch before running 2D ops; here that fold is a zero-cost reshape
because frames are already adjacent to batch in memory.

Helpers are plain functions around flax layers (not wrapper modules) so the
parameter tree keeps diffusers-compatible paths, e.g. ``conv1/kernel``.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def fold_frames(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """(B, F, H, W, C) -> ((B*F, H, W, C), F)."""
    b, f, h, w, c = x.shape
    return x.reshape(b * f, h, w, c), f


def unfold_frames(x: jnp.ndarray, frames: int) -> jnp.ndarray:
    """(B*F, H, W, C) -> (B, F, H, W, C)."""
    bf, h, w, c = x.shape
    return x.reshape(bf // frames, frames, h, w, c)


def spatial_conv(x: jnp.ndarray, conv: nn.Conv) -> jnp.ndarray:
    """Per-frame 2D convolution over a video tensor.

    Equivalent to the reference's ``InflatedConv3d`` (resnet.py:10-18): fold
    frames into batch, conv2d, unfold.
    """
    xf, frames = fold_frames(x)
    return unfold_frames(conv(xf), frames)


def conv2d(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    padding: int = 1,
    *,
    name: str,
    dtype: jnp.dtype = jnp.float32,
) -> nn.Conv:
    """A torch-convention 2D conv: explicit symmetric padding, NHWC."""
    return nn.Conv(
        features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dtype=dtype,
        name=name,
    )


def _group_norm_nhwc(
    x: jnp.ndarray, num_groups: int, eps: float,
    scale: jnp.ndarray, bias: jnp.ndarray,
) -> jnp.ndarray:
    """GroupNorm over (..., C) with f32 statistics, no f32 materialization.

    Statistics via E[x^2] - E[x]^2 so one fused pass over the bf16 input
    produces both moments; the normalize is an elementwise chain XLA fuses
    into consumers.  (The flax ``nn.GroupNorm(dtype=f32)`` route materializes
    a float32 copy of the activation first — 2x HBM traffic.)

    Layout note (v5e, measured): reducing a ``(n, spatial, G, C/G)`` view
    splits the channel (lane) dimension at C/G=10, which forces a relayout
    of the whole activation inside the reduce fusion (~0.2-0.6 ms per norm,
    ~35 ms per UNet forward).  Instead reduce **per channel over spatial
    only** — lane-aligned — and combine channels into groups on the tiny
    ``(n, C)`` moment array; the big tensor is only ever touched by
    lane-preserving ops.
    """
    n = x.shape[0]
    c = x.shape[-1]
    spatial = 1
    for s in x.shape[1:-1]:
        spatial *= s
    xs = x.reshape(n, spatial, c)
    xf = xs.astype(jnp.float32)
    # per-channel moments over spatial (sublane reduction, no lane split)
    s1 = jnp.mean(xf, axis=1)            # (n, C)
    s2 = jnp.mean(jnp.square(xf), axis=1)  # (n, C)
    # group-combine on the tiny stats array
    g1 = jnp.mean(s1.reshape(n, num_groups, c // num_groups), axis=-1)
    g2 = jnp.mean(s2.reshape(n, num_groups, c // num_groups), axis=-1)
    var = jnp.maximum(g2 - jnp.square(g1), 0.0)
    rstd = jax.lax.rsqrt(var + eps)      # (n, G)
    # broadcast group stats back to per-channel (tiny -> (n, C))
    mean_c = jnp.repeat(g1, c // num_groups, axis=-1)
    rstd_c = jnp.repeat(rstd, c // num_groups, axis=-1)
    w = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * w
    out = xf * w[:, None, :] + b[:, None, :]
    return out.reshape(x.shape).astype(x.dtype)


class GroupNorm(nn.Module):
    """Parameter-compatible replacement for ``nn.GroupNorm`` (scale/bias
    param names match), computing stats without an f32 activation copy."""

    num_groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return _group_norm_nhwc(x, self.num_groups, self.epsilon, scale, bias)


def group_norm(
    x: jnp.ndarray, norm: "GroupNorm", per_frame: bool = True
) -> jnp.ndarray:
    """GroupNorm over a video tensor with float32 statistics.

    ``per_frame=True`` reproduces ``InflatedGroupNorm`` (resnet.py:21-29):
    statistics per (sample, frame).  ``per_frame=False`` reproduces plain
    ``nn.GroupNorm`` applied to a 5D ``b c f h w`` tensor: statistics span
    frames too (reference uses this only when use_inflated_groupnorm=false).
    """
    if x.ndim == 5 and per_frame:
        xf, frames = fold_frames(x)
        return unfold_frames(norm(xf), frames)
    if x.ndim == 5:
        # stats across frames too: fold (F, H, W) into the spatial axis
        b, f, h, w, c = x.shape
        return norm(x.reshape(b, f * h * w, c)).reshape(x.shape)
    return norm(x)


def make_group_norm(
    num_groups: int, epsilon: float, *, name: str
) -> "GroupNorm":
    return GroupNorm(num_groups=num_groups, epsilon=epsilon, name=name)


class LayerNorm(nn.Module):
    """Parameter-compatible replacement for ``nn.LayerNorm`` (scale/bias
    param names match) with f32 statistics and no f32 activation copy."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        out = (xf - mean) * rstd * scale.astype(jnp.float32) + bias.astype(
            jnp.float32
        )
        return out.astype(x.dtype)


def layer_norm(x: jnp.ndarray, norm: "LayerNorm") -> jnp.ndarray:
    """LayerNorm with float32 statistics, result cast back to input dtype."""
    return norm(x)


def make_layer_norm(*, name: str) -> "LayerNorm":
    return LayerNorm(epsilon=1e-5, name=name)


class Upsample(nn.Module):
    """Nearest 2x spatial upsample + 3x3 conv (reference resnet.py:32-80).

    Spatial only — frames are untouched, matching
    ``F.interpolate(scale_factor=[1.0, 2.0, 2.0])`` (resnet.py:65).
    """

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, 2, axis=2)
        x = jnp.repeat(x, 2, axis=3)
        return spatial_conv(x, conv2d(self.features, name="conv", dtype=self.dtype))


class Downsample(nn.Module):
    """Stride-2 3x3 conv downsample (reference resnet.py:83-106)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return spatial_conv(
            x, conv2d(self.features, stride=2, name="conv", dtype=self.dtype)
        )
