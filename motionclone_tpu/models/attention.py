"""Spatial transformer: per-frame self/cross attention.

Rebuild of reference attention.py:31-300 (``Transformer3DModel`` /
``BasicTransformerBlock``) and the projection layout of ``CrossAttention``
(attention.py:302-459).  Attention math is delegated to
:mod:`motionclone_tpu.ops.attention`; the reference's three execution paths
(plain / sliced / xformers) collapse into that single dispatcher.

Parameter paths mirror diffusers keys: ``attn1.to_q``, ``to_out.0`` ->
``attn1/to_q``, ``attn1/to_out_0``; ``ff.net.0.proj`` -> ``ff/net_0/proj``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from motionclone_tpu.models.layers import (
    conv2d,
    group_norm,
    layer_norm,
    make_group_norm,
    make_layer_norm,
    spatial_conv,
)
from motionclone_tpu.ops.attention import dot_product_attention
from motionclone_tpu.ops.fused_block import (
    BlockWeights,
    TransformerWeights,
    fused_spatial_transformer,
    fused_transformer_block,
    supported as fused_block_supported,
)


class CrossAttention(nn.Module):
    """Multi-head attention with q from x, k/v from context (or x if None).

    Head layout matches reference attention.py:331-336: ``inner_dim = heads *
    dim_head`` and scale ``dim_head ** -0.5``.
    """

    heads: int
    dim_head: int
    query_dim: int
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)
        out = dot_product_attention(
            q, k, v, scale=self.dim_head**-0.5, impl=self.attention_impl
        )
        out = out.reshape(b, sq, inner)
        return nn.Dense(self.query_dim, dtype=self.dtype, name="to_out_0")(out)


class GEGLU(nn.Module):
    """diffusers GEGLU: Dense to 2*inner, gate with exact (erf) GELU."""

    inner_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.inner_dim * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * jax.nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """diffusers FeedForward with geglu activation, mult=4."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        h = GEGLU(inner, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    """Self-attn + cross-attn + FF with pre-LayerNorms (attention.py:145-300).

    The reference's optional cross-frame/temporal attn1 variants are never
    enabled in MotionClone configs and are not built.
    """

    dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int]
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        if (
            self.attention_impl == "fused"
            and not self.is_initializing()
            and context is not None
            and self.cross_attention_dim is not None
            and fused_block_supported(x.shape[1], self.dim, self.heads)
        ):
            # whole-block Pallas kernel (forward-only paths); parameters were
            # created by the unfused path during init, read them back here
            p = lambda name: self.get_variable("params", name)
            w = BlockWeights(
                ln1_scale=p("norm1")["scale"],
                ln1_bias=p("norm1")["bias"],
                wq1=p("attn1")["to_q"]["kernel"],
                wk1=p("attn1")["to_k"]["kernel"],
                wv1=p("attn1")["to_v"]["kernel"],
                wo1=p("attn1")["to_out_0"]["kernel"],
                bo1=p("attn1")["to_out_0"]["bias"],
                ln2_scale=p("norm2")["scale"],
                ln2_bias=p("norm2")["bias"],
                wq2=p("attn2")["to_q"]["kernel"],
                wk2=p("attn2")["to_k"]["kernel"],
                wv2=p("attn2")["to_v"]["kernel"],
                wo2=p("attn2")["to_out_0"]["kernel"],
                bo2=p("attn2")["to_out_0"]["bias"],
                ln3_scale=p("norm3")["scale"],
                ln3_bias=p("norm3")["bias"],
                wff1=p("ff")["net_0"]["proj"]["kernel"],
                bff1=p("ff")["net_0"]["proj"]["bias"],
                wff2=p("ff")["net_2"]["kernel"],
                bff2=p("ff")["net_2"]["bias"],
            )
            return fused_transformer_block(
                x.astype(self.dtype), context.astype(self.dtype), w,
                heads=self.heads,
            )

        h = layer_norm(x, make_layer_norm(name="norm1"))
        x = x + CrossAttention(
            heads=self.heads,
            dim_head=self.dim_head,
            query_dim=self.dim,
            attention_impl=self.attention_impl,
            dtype=self.dtype,
            name="attn1",
        )(h)

        if self.cross_attention_dim is not None:
            h = layer_norm(x, make_layer_norm(name="norm2"))
            x = x + CrossAttention(
                heads=self.heads,
                dim_head=self.dim_head,
                query_dim=self.dim,
                attention_impl="xla",  # kv length 77 — einsum path
                dtype=self.dtype,
                name="attn2",
            )(h, context)

        h = layer_norm(x, make_layer_norm(name="norm3"))
        x = x + FeedForward(self.dim, dtype=self.dtype, name="ff")(h)
        return x


class Transformer3DModel(nn.Module):
    """Per-frame spatial transformer over a video tensor (attention.py:31-142).

    Input/output (B, F, H, W, C).  The text context is shared by all frames
    (repeated per frame in the reference, attention.py:100; here the fold of
    frames into batch achieves the same with a broadcasted repeat).
    """

    heads: int
    dim_head: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = 768
    norm_num_groups: int = 32
    use_linear_projection: bool = False
    attention_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    def _block_weights(self, prefix: str) -> BlockWeights:
        blk = self.get_variable("params", prefix)
        return BlockWeights(
            ln1_scale=blk["norm1"]["scale"],
            ln1_bias=blk["norm1"]["bias"],
            wq1=blk["attn1"]["to_q"]["kernel"],
            wk1=blk["attn1"]["to_k"]["kernel"],
            wv1=blk["attn1"]["to_v"]["kernel"],
            wo1=blk["attn1"]["to_out_0"]["kernel"],
            bo1=blk["attn1"]["to_out_0"]["bias"],
            ln2_scale=blk["norm2"]["scale"],
            ln2_bias=blk["norm2"]["bias"],
            wq2=blk["attn2"]["to_q"]["kernel"],
            wk2=blk["attn2"]["to_k"]["kernel"],
            wv2=blk["attn2"]["to_v"]["kernel"],
            wo2=blk["attn2"]["to_out_0"]["kernel"],
            bo2=blk["attn2"]["to_out_0"]["bias"],
            ln3_scale=blk["norm3"]["scale"],
            ln3_bias=blk["norm3"]["bias"],
            wff1=blk["ff"]["net_0"]["proj"]["kernel"],
            bff1=blk["ff"]["net_0"]["proj"]["bias"],
            wff2=blk["ff"]["net_2"]["kernel"],
            bff2=blk["ff"]["net_2"]["bias"],
        )

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        b, f, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        residual = x

        if (
            self.attention_impl == "fused"
            and not self.is_initializing()
            and context is not None
            and self.cross_attention_dim is not None
            and not self.use_linear_projection
            and self.num_layers == 1
            and inner == c
            and fused_block_supported(hh * ww, inner, self.heads)
        ):
            # whole Transformer3DModel (GN with in-kernel per-frame stats
            # -> proj_in -> block -> proj_out -> +residual) as one Pallas
            # kernel — one HBM read of the activation, one write
            p = lambda name: self.get_variable("params", name)
            w = TransformerWeights(
                gn_scale=p("norm")["scale"],
                gn_bias=p("norm")["bias"],
                win=p("proj_in")["kernel"].reshape(c, inner),
                bin=p("proj_in")["bias"],
                block=self._block_weights("transformer_blocks_0"),
                wout=p("proj_out")["kernel"].reshape(inner, c),
                bout=p("proj_out")["bias"],
            )
            ctx = jnp.repeat(context, f, axis=0).astype(self.dtype)
            out = fused_spatial_transformer(
                x.reshape(b * f, hh * ww, c).astype(self.dtype), ctx, w,
                heads=self.heads, groups=self.norm_num_groups,
            )
            return out.reshape(b, f, hh, ww, c)

        h = group_norm(
            x,
            make_group_norm(self.norm_num_groups, 1e-6, name="norm"),
            per_frame=True,  # reference folds frames before this norm
        )
        if self.use_linear_projection:
            h = h.reshape(b * f, hh * ww, c)
            h = nn.Dense(inner, dtype=self.dtype, name="proj_in")(h)
        else:
            h = spatial_conv(
                h, conv2d(inner, kernel=1, padding=0, name="proj_in", dtype=self.dtype)
            )
            h = h.reshape(b * f, hh * ww, inner)

        if context is not None:
            # (B, S, D) -> (B*F, S, D): every frame attends to the same text
            ctx = jnp.repeat(context, f, axis=0)
        else:
            ctx = None

        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                dim_head=self.dim_head,
                cross_attention_dim=self.cross_attention_dim,
                attention_impl=self.attention_impl,
                dtype=self.dtype,
                name=f"transformer_blocks_{i}",
            )(h, ctx)

        if self.use_linear_projection:
            h = nn.Dense(c, dtype=self.dtype, name="proj_out")(h)
            h = h.reshape(b, f, hh, ww, c)
        else:
            h = h.reshape(b, f, hh, ww, inner)
            h = spatial_conv(
                h, conv2d(c, kernel=1, padding=0, name="proj_out", dtype=self.dtype)
            )
        return h + residual
