"""Timestep and temporal-position embeddings.

Rebuilds diffusers' ``Timesteps``/``TimestepEmbedding`` (used by reference
unet.py:101-104) and the motion module's sinusoidal ``PositionalEncoding``
(reference motion_module.py:228-247) as pure functions / linen modules.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features, float32, shape (batch, dim).

    Matches diffusers ``get_timestep_embedding`` with SD1.5's settings
    (flip_sin_to_cos=True, downscale_freq_shift=0).
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    if flip_sin_to_cos:
        return jnp.concatenate([cos, sin], axis=-1)
    return jnp.concatenate([sin, cos], axis=-1)


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal features (diffusers ``TimestepEmbedding``)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(x)
        return x


def temporal_positional_encoding(d_model: int, max_len: int) -> np.ndarray:
    """The motion module's fixed sinusoidal table (motion_module.py:237-241).

    Returns float32 (max_len, d_model): pe[:, 0::2]=sin, pe[:, 1::2]=cos.
    Not a parameter — the reference registers it as a non-persistent buffer
    and checkpoint loaders must skip ``pos_encoder.pe`` keys.
    """
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model)
    )
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)
