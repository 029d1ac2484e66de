"""AutoencoderKL (SD1.5 VAE) in JAX, channels-last.

The reference consumes diffusers' ``AutoencoderKL`` as an external runtime
component (reference t2v_video_sample.py:25, SURVEY §2 L0); this is a
from-scratch rebuild of that architecture: encoder/decoder with
ResnetBlock2D stacks, a single-head mid attention, asymmetric-padded
downsampling, and the (mean, logvar) latent head.

Frames of a video tensor (B, F, H, W, 3) are processed independently by
folding into the batch — unlike the reference's per-frame Python decode loop
(pipeline_animation.py:256-257, a VRAM workaround) the whole clip is decoded
in one XLA call.

Parameter paths mirror modern diffusers keys (``encoder.down_blocks.0.
resnets.0.norm1`` ...) so the LDM/diffusers checkpoint mappers stay
mechanical.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionclone_tpu.models.layers import conv2d
from motionclone_tpu.ops.attention import dot_product_attention


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(block_out_channels=(8, 16), layers_per_block=1, norm_num_groups=4)


class ResnetBlock2D(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        h = nn.silu(h)
        h = conv2d(self.out_channels, name="conv1", dtype=self.dtype)(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=jnp.float32, name="norm2")(
            h.astype(jnp.float32)
        ).astype(h.dtype)
        h = nn.silu(h)
        h = conv2d(self.out_channels, name="conv2", dtype=self.dtype)(h)
        if in_ch != self.out_channels:
            x = conv2d(
                self.out_channels, kernel=1, padding=0,
                name="conv_shortcut", dtype=self.dtype,
            )(x)
        return x + h


class AttentionBlock2D(nn.Module):
    """Single-head full-channel self-attention over spatial positions
    (diffusers VAE mid attention)."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = nn.GroupNorm(
            self.groups, epsilon=1e-6, dtype=jnp.float32, name="group_norm"
        )(x.astype(jnp.float32)).astype(x.dtype)
        y = y.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :],
            scale=c**-0.5,
            impl="chunked" if h * w >= 2048 else "xla",
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return residual + out.reshape(b, h, w, c)


class Downsample2D(nn.Module):
    """Stride-2 conv with diffusers' asymmetric (0,1) padding."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.features,
            kernel_size=(3, 3),
            strides=(2, 2),
            padding=((0, 1), (0, 1)),
            dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.repeat(x, 2, axis=1)
        x = jnp.repeat(x, 2, axis=2)
        return conv2d(self.features, name="conv", dtype=self.dtype)(x)


class MidBlock2D(nn.Module):
    channels: int
    groups: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = ResnetBlock2D(self.channels, self.groups, self.dtype, name="resnets_0")(x)
        x = AttentionBlock2D(self.groups, self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(self.channels, self.groups, self.dtype, name="resnets_1")(x)
        return x


class DownEncoderBlock2D(nn.Module):
    channels: int
    num_layers: int
    groups: int
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                self.channels, self.groups, self.dtype, name=f"resnets_{j}"
            )(x)
        if self.add_downsample:
            x = Downsample2D(self.channels, self.dtype, name="downsamplers_0")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    channels: int
    num_layers: int
    groups: int
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                self.channels, self.groups, self.dtype, name=f"resnets_{j}"
            )(x)
        if self.add_upsample:
            x = Upsample2D(self.channels, self.dtype, name="upsamplers_0")(x)
        return x


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = conv2d(cfg.block_out_channels[0], name="conv_in", dtype=self.dtype)(x)
        for i, ch in enumerate(cfg.block_out_channels):
            x = DownEncoderBlock2D(
                channels=ch,
                num_layers=cfg.layers_per_block,
                groups=cfg.norm_num_groups,
                add_downsample=i < len(cfg.block_out_channels) - 1,
                dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x)
        x = MidBlock2D(
            cfg.block_out_channels[-1], cfg.norm_num_groups, self.dtype,
            name="mid_block",
        )(x)
        x = nn.GroupNorm(
            cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out"
        )(x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        return conv2d(
            2 * cfg.latent_channels, name="conv_out", dtype=self.dtype
        )(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        reversed_ch = list(reversed(cfg.block_out_channels))
        x = conv2d(reversed_ch[0], name="conv_in", dtype=self.dtype)(z)
        x = MidBlock2D(
            reversed_ch[0], cfg.norm_num_groups, self.dtype, name="mid_block"
        )(x)
        for i, ch in enumerate(reversed_ch):
            x = UpDecoderBlock2D(
                channels=ch,
                num_layers=cfg.layers_per_block + 1,
                groups=cfg.norm_num_groups,
                add_upsample=i < len(reversed_ch) - 1,
                dtype=self.dtype,
                name=f"up_blocks_{i}",
            )(x)
        x = nn.GroupNorm(
            cfg.norm_num_groups, epsilon=1e-6, dtype=jnp.float32, name="conv_norm_out"
        )(x.astype(jnp.float32)).astype(x.dtype)
        x = nn.silu(x)
        return conv2d(cfg.out_channels, name="conv_out", dtype=self.dtype)(x)


class AutoencoderKL(nn.Module):
    """encode: pixels (B,F,H,W,3) in [-1,1] -> (mean, logvar) latents;
    decode: latents (B,F,h,w,4) -> pixels.  Scaling by ``scaling_factor``
    is the caller's concern (matching the reference's explicit
    ``x 0.18215`` at motionclone_functions.py:32)."""

    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, self.dtype, name="encoder")
        self.decoder = Decoder(self.cfg, self.dtype, name="decoder")
        self.quant_conv = conv2d(
            2 * self.cfg.latent_channels, kernel=1, padding=0,
            name="quant_conv", dtype=self.dtype,
        )
        self.post_quant_conv = conv2d(
            self.cfg.latent_channels, kernel=1, padding=0,
            name="post_quant_conv", dtype=self.dtype,
        )

    def _fold(self, x):
        b, f = x.shape[:2]
        return x.reshape((b * f,) + x.shape[2:]), (b, f)

    def _unfold(self, x, bf):
        b, f = bf
        return x.reshape((b, f) + x.shape[1:])

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        xf, bf = self._fold(x)
        moments = self.quant_conv(self.encoder(xf))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return self._unfold(mean, bf), self._unfold(logvar, bf)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        zf, bf = self._fold(z)
        out = self.decoder(self.post_quant_conv(zf))
        return self._unfold(out, bf)

    def __call__(self, x: jnp.ndarray):
        mean, logvar = self.encode(x)
        return self.decode(mean), (mean, logvar)


def sample_latents(
    mean: jnp.ndarray, logvar: jnp.ndarray, key: jax.Array
) -> jnp.ndarray:
    """Reparameterized draw from the posterior (DiagonalGaussian.sample)."""
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar.astype(jnp.float32))
    eps = jax.random.normal(key, mean.shape, dtype=jnp.float32)
    return (mean.astype(jnp.float32) + std * eps).astype(mean.dtype)
