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


def group_norm(
    x: jnp.ndarray, norm: nn.GroupNorm, per_frame: bool = True
) -> jnp.ndarray:
    """GroupNorm over a video tensor with float32 statistics.

    ``per_frame=True`` reproduces ``InflatedGroupNorm`` (resnet.py:21-29):
    statistics per (sample, frame).  ``per_frame=False`` reproduces plain
    ``nn.GroupNorm`` applied to a 5D ``b c f h w`` tensor: statistics span
    frames too (reference uses this only when use_inflated_groupnorm=false).
    The wrapped flax norm must be constructed with ``dtype=jnp.float32``.
    """
    dtype = x.dtype
    if x.ndim == 5 and per_frame:
        xf, frames = fold_frames(x)
        out = unfold_frames(norm(xf.astype(jnp.float32)), frames)
    else:
        out = norm(x.astype(jnp.float32))
    return out.astype(dtype)


def make_group_norm(
    num_groups: int, epsilon: float, *, name: str
) -> nn.GroupNorm:
    return nn.GroupNorm(
        num_groups=num_groups, epsilon=epsilon, dtype=jnp.float32, name=name
    )


def layer_norm(x: jnp.ndarray, norm: nn.LayerNorm) -> jnp.ndarray:
    """LayerNorm with float32 statistics, result cast back to input dtype."""
    return norm(x.astype(jnp.float32)).astype(x.dtype)


def make_layer_norm(*, name: str) -> nn.LayerNorm:
    return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)


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
