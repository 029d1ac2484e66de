"""CLIP ViT-L/14 text encoder in JAX.

The reference consumes ``transformers.CLIPTextModel`` as an external runtime
component (reference t2v_video_sample.py:24, SURVEY §2 L0); this is a
from-scratch rebuild of the text tower: causal transformer with quick-GELU
MLPs and a final layer norm, emitting the last hidden state (B, 77, 768)
used as the UNet's cross-attention context.

Parameter paths mirror the HF state-dict keys
(``text_model.encoder.layers.N.self_attn.q_proj`` ...).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    # transformers ``hidden_act``: SD1.5's ViT-L/14 tower uses quick_gelu;
    # SD2.x-style custom checkpoints ship OpenCLIP towers with exact gelu.
    hidden_act: str = "quick_gelu"

    def __post_init__(self):
        if self.hidden_act not in _ACTIVATIONS:
            raise ValueError(
                f"unsupported CLIP hidden_act {self.hidden_act!r}; "
                f"supported: {sorted(_ACTIVATIONS)}"
            )


def tiny_clip_config() -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, max_position_embeddings=77,
    )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(1.702 * x)


# transformers ACT2FN names -> jax fns ("gelu" is the exact erf form there,
# "gelu_new" the tanh approximation)
_ACTIVATIONS = {
    "quick_gelu": quick_gelu,
    "gelu": lambda x: nn.gelu(x, approximate=False),
    "gelu_new": lambda x: nn.gelu(x, approximate=True),
}


class CLIPAttention(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden_size
        head_dim = d // cfg.num_heads
        b, s, _ = x.shape
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x) * head_dim**-0.5
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, s, cfg.num_heads, head_dim)
        k = k.reshape(b, s, cfg.num_heads, head_dim)
        v = v.reshape(b, s, cfg.num_heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + causal_mask
        probs = nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, causal_mask: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm1")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        x = x + CLIPAttention(cfg, self.dtype, name="self_attn")(h, causal_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="layer_norm2")(
            x.astype(jnp.float32)
        ).astype(x.dtype)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="mlp_fc1")(h)
        h = _ACTIVATIONS[cfg.hidden_act](h)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Token ids (B, 77) int32 -> last hidden state (B, 77, hidden)."""

    cfg: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b, s = input_ids.shape
        tok = nn.Embed(
            cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding"
        )(input_ids)
        pos = nn.Embed(
            cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
            name="position_embedding",
        )(jnp.arange(s)[None, :])
        x = tok + pos

        causal = np.triu(np.full((s, s), -jnp.inf, dtype=np.float32), k=1)
        causal_mask = jnp.asarray(causal)[None, None]

        for i in range(cfg.num_layers):
            x = CLIPEncoderLayer(cfg, self.dtype, name=f"layers_{i}")(x, causal_mask)

        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="final_layer_norm"
        )(x.astype(jnp.float32)).astype(x.dtype)
        return x
