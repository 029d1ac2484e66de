"""Temporal motion module (AnimateDiff-style) with explicit probability output.

Rebuild of reference motion_module.py:51-345.  The key structural change vs
the reference: temporal attention probabilities are *returned* as an
auxiliary output when requested, instead of being captured by mutable
processor hooks (reference xformer_attention.py:17-38).  That makes the
motion representation (SURVEY §0) and the guidance loss pure functions of
the UNet inputs — ``jax.grad``-able with no recorder state.

Parameter paths mirror the motion-module checkpoint keys
(``temporal_transformer.transformer_blocks.0.attention_blocks.0.to_q`` ...).
The sinusoidal ``pos_encoder.pe`` buffer is a compile-time constant here.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionclone_tpu.config import MotionModuleConfig
from motionclone_tpu.models.embeddings import temporal_positional_encoding
from motionclone_tpu.models.layers import (
    group_norm,
    layer_norm,
    make_group_norm,
    make_layer_norm,
)
from motionclone_tpu.models.attention import FeedForward
from motionclone_tpu.ops.attention import attention_probs, dot_product_attention
from motionclone_tpu.ops.fused_temporal import (
    AttnWeights,
    TemporalModuleWeights,
    folded_groupnorm_affine,
    fused_temporal_module,
    supported as fused_temporal_supported,
)
from motionclone_tpu.ops.temporal_attention import (
    pick_tile as pick_temporal_tile,
    supported as temporal_kernel_supported,
    temporal_attention,
)


def _to_pixel_major(
    x: jnp.ndarray, b: int, f: int, s: int, heads: int, dim_head: int
) -> jnp.ndarray:
    """(B, F, S, heads*D) -> (B*S, F, heads, D) for the probs/fallback paths."""
    return (
        x.reshape(b, f, s, heads, dim_head)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b * s, f, heads, dim_head)
    )


class VersatileAttention(nn.Module):
    """Temporal self-attention over per-pixel frame sequences.

    Input (B, F, S, C) where S = H*W.  Sequences are the F frames at each
    spatial location (reference motion_module.py:279 ``(b f) d c ->
    (b d) f c``).  Sinusoidal positional encoding is added to the (already
    LayerNormed) input before the q/k/v projections
    (motion_module.py:281-282,293-302).

    Returns ``(out, probs)`` where probs is (B, S, heads, F, F) float32 when
    ``return_probs`` else None.
    """

    heads: int
    dim_head: int
    query_dim: int
    use_pos_encoding: bool = True
    pos_encoding_max_len: int = 24
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_probs: bool = False
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        b, f, s, c = x.shape
        inner = self.heads * self.dim_head

        # Stay in the natural (B, F, S, C) layout: the q/k/v projections
        # contract only C, and the fused kernel consumes this layout
        # directly, so no pixel-major transpose is ever materialized
        # (the reference pays two full-tensor rearranges per block,
        # motion_module.py:279,309).
        # global frame count under frame sharding (None axis -> local == global)
        fk = (
            f * jax.lax.axis_size(self.frames_axis)
            if self.frames_axis is not None
            else f
        )
        h = x
        if self.use_pos_encoding:
            pe = jnp.asarray(
                temporal_positional_encoding(c, self.pos_encoding_max_len),
                dtype=h.dtype,
            )
            if self.frames_axis is not None:
                # sharded frame axis: this shard holds global frames
                # [start, start + f) — slice its PE rows dynamically.
                # dynamic_slice clamps out-of-range starts, which would
                # silently reuse another shard's rows where the unsharded
                # path fails loudly — validate the global length statically
                if fk > pe.shape[0]:
                    raise ValueError(
                        f"video_length {fk} exceeds the positional-encoding "
                        f"table ({pe.shape[0]} rows)"
                    )
                start = jax.lax.axis_index(self.frames_axis) * f
                pe = jax.lax.dynamic_slice_in_dim(pe, start, f, 0)
            else:
                pe = pe[:f]
            h = h + pe[None, :, None, :]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(h)

        scale = self.dim_head**-0.5
        probs = None
        if self.frames_axis is not None:
            # sequence parallelism over frames (shard_map): queries stay
            # local, keys/values are gathered across the frame shards over
            # ICI — every pixel's f-long sequence attends to all frames
            k = jax.lax.all_gather(k, self.frames_axis, axis=1, tiled=True)
            v = jax.lax.all_gather(v, self.frames_axis, axis=1, tiled=True)
            rect_ts = (
                pick_temporal_tile(f, s)
                if self.attention_impl not in ("xla", "chunked")
                else None
            )
            if not return_probs and rect_ts is not None:
                # rectangular (f local x fk global) packed Pallas kernel:
                # natural layout in and out, no pixel-major transposes of
                # the gathered 42 MB K/V tensors
                out = temporal_attention(
                    q, k, v, heads=self.heads, scale=scale, ts=rect_ts
                )
            else:
                qp = _to_pixel_major(q, b, f, s, self.heads, self.dim_head)
                kp = _to_pixel_major(k, b, fk, s, self.heads, self.dim_head)
                vp = _to_pixel_major(v, b, fk, s, self.heads, self.dim_head)
                if return_probs:
                    # (B*S, heads, f, fk) f32
                    p = attention_probs(qp, kp, scale)
                    probs = p.reshape(b, s, self.heads, f, fk)
                    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vp.dtype), vp)
                else:
                    out = dot_product_attention(
                        qp, kp, vp, scale=scale, impl="xla"
                    )
                out = out.reshape(b, s, f, inner).transpose(0, 2, 1, 3)
        elif return_probs:
            # the f x f probability block *is* the motion feature
            # (motionclone_functions.py:260-283)
            qp = _to_pixel_major(q, b, f, s, self.heads, self.dim_head)
            kp = _to_pixel_major(k, b, f, s, self.heads, self.dim_head)
            vp = _to_pixel_major(v, b, f, s, self.heads, self.dim_head)
            p = attention_probs(qp, kp, scale)  # (B*S, heads, F, F) f32
            probs = p.reshape(b, s, self.heads, f, f)
            out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vp.dtype), vp)
            out = out.reshape(b, s, f, inner).transpose(0, 2, 1, 3)
        elif (
            self.attention_impl not in ("xla", "chunked")
            and temporal_kernel_supported(f, s)
        ):
            # "xla"/"chunked" force pure-XLA math — required under GSPMD
            # sharding (Pallas custom calls have no partitioning rule)
            out = temporal_attention(q, k, v, heads=self.heads, scale=scale)
        else:
            qp = _to_pixel_major(q, b, f, s, self.heads, self.dim_head)
            kp = _to_pixel_major(k, b, f, s, self.heads, self.dim_head)
            vp = _to_pixel_major(v, b, f, s, self.heads, self.dim_head)
            out = dot_product_attention(qp, kp, vp, scale=scale, impl="xla")
            out = out.reshape(b, s, f, inner).transpose(0, 2, 1, 3)

        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)
        return out, probs


class TemporalTransformerBlock(nn.Module):
    """N temporal attention blocks + feed-forward (motion_module.py:164-225)."""

    dim: int
    heads: int
    dim_head: int
    attention_block_types: Tuple[str, ...]
    use_pos_encoding: bool
    pos_encoding_max_len: int
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_probs: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        probs_out = []
        for i, block_type in enumerate(self.attention_block_types):
            assert block_type == "Temporal_Self", block_type
            h = layer_norm(x, make_layer_norm(name=f"norms_{i}"))
            out, probs = VersatileAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                query_dim=self.dim,
                use_pos_encoding=self.use_pos_encoding,
                pos_encoding_max_len=self.pos_encoding_max_len,
                attention_impl=self.attention_impl,
                frames_axis=self.frames_axis,
                dtype=self.dtype,
                name=f"attention_blocks_{i}",
            )(h, return_probs=return_probs)
            x = x + out
            if return_probs:
                probs_out.append(probs)

        h = layer_norm(x, make_layer_norm(name="ff_norm"))
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x, tuple(probs_out)


class TemporalTransformer3D(nn.Module):
    """GroupNorm -> proj_in -> temporal blocks -> proj_out -> +residual
    (motion_module.py:88-161).  Input/output (B, F, H, W, C).

    With ``attention_impl="fused"`` (non-differentiated passes, no probs
    requested) the whole module after the GroupNorm statistics runs as one
    Pallas kernel (ops/fused_temporal.py); init always takes the unfused
    path so the parameter tree is identical.
    """

    cfg: MotionModuleConfig
    zero_init_proj_out: bool = True
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_probs: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        b, f, hh, ww, c = x.shape
        residual = x
        heads = self.cfg.num_attention_heads
        dim_head = c // heads // self.cfg.temporal_attention_dim_div
        inner = heads * dim_head

        if (
            self.attention_impl == "fused"
            and self.frames_axis is None
            and not self.is_initializing()
            and not return_probs
            and inner == c
            and self.cfg.num_transformer_block == 1
            and all(t == "Temporal_Self" for t in self.cfg.attention_block_types)
            and fused_temporal_supported(f, hh * ww, c, heads)
        ):
            p = lambda name: self.get_variable("params", name)
            xs = x.reshape(b, f, hh * ww, c)
            gw, gb = folded_groupnorm_affine(
                xs, self.cfg.norm_num_groups, 1e-6,
                p("norm")["scale"], p("norm")["bias"],
            )
            blk = p("transformer_blocks_0")
            attn = []
            for i in range(len(self.cfg.attention_block_types)):
                ab = blk[f"attention_blocks_{i}"]
                attn.append(AttnWeights(
                    ln_scale=blk[f"norms_{i}"]["scale"],
                    ln_bias=blk[f"norms_{i}"]["bias"],
                    wq=ab["to_q"]["kernel"],
                    wk=ab["to_k"]["kernel"],
                    wv=ab["to_v"]["kernel"],
                    wo=ab["to_out_0"]["kernel"],
                    bo=ab["to_out_0"]["bias"],
                ))
            pe = None
            if self.cfg.temporal_position_encoding:
                pe = temporal_positional_encoding(
                    c, self.cfg.temporal_position_encoding_max_len
                )[:f]
            w = TemporalModuleWeights(
                gn_w=gw,
                gn_b=gb,
                pe=pe,
                win=p("proj_in")["kernel"],
                bin=p("proj_in")["bias"],
                attn=tuple(attn),
                ffln_scale=blk["ff_norm"]["scale"],
                ffln_bias=blk["ff_norm"]["bias"],
                wff1=blk["ff"]["net_0"]["proj"]["kernel"],
                bff1=blk["ff"]["net_0"]["proj"]["bias"],
                wff2=blk["ff"]["net_2"]["kernel"],
                bff2=blk["ff"]["net_2"]["bias"],
                wout=p("proj_out")["kernel"],
                bout=p("proj_out")["bias"],
            )
            out = fused_temporal_module(
                xs.astype(self.dtype), w, heads=heads
            )
            return out.reshape(b, f, hh, ww, c), ()

        h = group_norm(
            x,
            make_group_norm(self.cfg.norm_num_groups, 1e-6, name="norm"),
            per_frame=True,  # reference folds frames before this norm
        )
        h = h.reshape(b, f, hh * ww, c)
        h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)

        all_probs = []
        for i in range(self.cfg.num_transformer_block):
            h, probs = TemporalTransformerBlock(
                dim=inner,
                heads=heads,
                dim_head=dim_head,
                attention_block_types=self.cfg.attention_block_types,
                use_pos_encoding=self.cfg.temporal_position_encoding,
                pos_encoding_max_len=self.cfg.temporal_position_encoding_max_len,
                attention_impl=self.attention_impl,
                frames_axis=self.frames_axis,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, return_probs=return_probs)
            all_probs.extend(probs)

        kwargs = (
            dict(kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros)
            if self.zero_init_proj_out
            else {}
        )
        h = nn.Dense(c, dtype=self.dtype, name="proj_out", **kwargs)(h)
        h = h.reshape(b, f, hh, ww, c)
        return h + residual, tuple(all_probs)


class VanillaTemporalModule(nn.Module):
    """Wrapper matching the checkpoint nesting ``...motion_modules.N.
    temporal_transformer...`` (motion_module.py:51-85).  ``zero_initialize``
    makes the module an identity at init (proj_out zeroed,
    motion_module.py:77-78)."""

    cfg: MotionModuleConfig
    attention_impl: str = "auto"
    frames_axis: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_probs: bool = False
    ) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, ...]]:
        return TemporalTransformer3D(
            cfg=self.cfg,
            zero_init_proj_out=self.cfg.zero_initialize,
            attention_impl=self.attention_impl,
            frames_axis=self.frames_axis,
            dtype=self.dtype,
            name="temporal_transformer",
        )(x, return_probs=return_probs)
