"""Fully fused spatial transformer block as one Pallas TPU kernel.

One `BasicTransformerBlock` (reference attention.py:145-300) is, in XLA, a
chain of ~15 dispatches — 3 LayerNorms, 9 projections, 2 attentions, GEGLU,
3 residual adds — each crossing HBM and frequently paying layout-relayout
copies (measured up to 4 ms for a single residual add at 64x64 on v5e).
This kernel executes the whole sublayer chain

    x  ->  x + Wo1 * SelfAttn(LN1 x)            (attn1)
       ->  x + Wo2 * CrossAttn(LN2 x, ctx)      (attn2, kv = text tokens)
       ->  x + W2  * GEGLU(W1 * LN3 x)          (ff)

reading ``x`` once and writing the result once.  K/V for the self-attention
(and the projected text K/V) are computed on the first query tile of each
frame and cached in VMEM scratch across the remaining tiles.

Forward-only by design: it is used for the non-differentiated UNet passes
(the unconditional CFG branch and the vanilla phase).  The guided
(differentiated) pass keeps the unfused path, whose attention already has a
custom VJP (ops/flash_attention.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BQ = 512
LN_EPS = 1e-5
# weights for all three sublayers must fit VMEM next to the K/V caches
MAX_FUSED_CHANNELS = 640


class BlockWeights(NamedTuple):
    """Parameters of one BasicTransformerBlock, flax layout (in_dim, out_dim)."""

    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    wq1: jnp.ndarray
    wk1: jnp.ndarray
    wv1: jnp.ndarray
    wo1: jnp.ndarray
    bo1: jnp.ndarray
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    wq2: jnp.ndarray
    wk2: jnp.ndarray  # (ctx_dim, C)
    wv2: jnp.ndarray  # (ctx_dim, C)
    wo2: jnp.ndarray
    bo2: jnp.ndarray
    ln3_scale: jnp.ndarray
    ln3_bias: jnp.ndarray
    wff1: jnp.ndarray  # (C, 2 * 4C) GEGLU projection
    bff1: jnp.ndarray
    wff2: jnp.ndarray  # (4C, C)
    bff2: jnp.ndarray


def _ln(x_bf16, scale_ref, bias_ref, out_dtype):
    xf = x_bf16.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    out = (xf - mean) * rstd * scale_ref[...] + bias_ref[...]
    return out.astype(out_dtype)


def _mm(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs err 1.5e-7 — far
    below bf16 resolution); Mosaic has no erf/erfc lowering."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * (2.0**-0.5)))


# Maxless softmax: logits are clamped to +-LOGIT_CLIP instead of row-max
# subtracted.  Exact whenever |logits| <= 75 (f32 exp is finite to ~88 and
# the 4096-term sum stays < 3e36); beyond that the distribution flattens
# gracefully instead of overflowing.  LN-normalized q/k with scale 1/sqrt(d)
# keep |logits| well under 50 in practice; the max reduction this removes
# cost ~40% of the attention time on v5e (measured, PERF.md).
LOGIT_CLIP = 75.0


def _attend(q, k, v, heads, scale, dtype):
    """q: (BQ, C), k/v: (SK, C); per-head attention -> (BQ, C), row-major.

    Used for cross-attention, whose keys come from raw (un-normalized) CLIP
    hidden states — no magnitude bound holds there, so keep the exact
    max-subtracted softmax; with SK = 77 text tokens the row-max reduction
    is negligible.  The 1/sum normalizer is still folded into the (BQ, d)
    output instead of dividing the (BQ, SK) probability tile."""
    c = q.shape[-1]
    d = c // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(_mm(e.astype(dtype), v[:, sl]) * r)
    return jnp.concatenate(outs, axis=-1).astype(dtype)


def _attend_self_t(q, k_ref, vt_ref, heads, scale, dtype):
    """Whole-sequence self attention, channels-major internals.

    ``q``: (BQ, C) row-major; ``k_ref``: (S, C); ``vt_ref``: (C, S) —
    V pre-transposed once per frame.  Computing ``logits^T = k @ q^T`` keeps
    the unavoidable head_dim-padded contraction, but ``out^T = v^T @ p``
    then contracts over S at full MXU efficiency (head_dim = 40 pads the
    128-wide MXU K dim 3.2x in the row-major form; measured 11.4 -> 6.0 ms
    per 64x64x16f call with the clipped softmax).  Returns (BQ, C).
    """
    c = q.shape[-1]
    d = c // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits_t = jax.lax.dot_general(
            k_ref[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (S, BQ)
        e = jnp.exp(jnp.clip(logits_t, -LOGIT_CLIP, LOGIT_CLIP))
        r = 1.0 / jnp.sum(e, axis=0, keepdims=True)  # (1, BQ)
        o_t = jax.lax.dot_general(
            vt_ref[sl, :], e.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, BQ)
        outs.append(o_t * r)
    return jnp.transpose(
        jnp.concatenate(outs, axis=0), (1, 0)
    ).astype(dtype)


def _kernel(
    xt_ref, xf_ref, ctx_ref,
    ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
    ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
    ln3_s, ln3_b, wff1, bff1, wff2, bff2,
    y_ref,
    k_scr, vt_scr, k2_scr, v2_scr,
    *, heads: int, scale: float,
):
    qi = pl.program_id(1)
    dtype = xt_ref.dtype

    @pl.when(qi == 0)
    def _():
        xn_full = _ln(xf_ref[0], ln1_s, ln1_b, dtype)
        k_scr[...] = _mm(xn_full, wk1[...]).astype(dtype)
        vt_scr[...] = jnp.transpose(
            _mm(xn_full, wv1[...]).astype(dtype), (1, 0)
        )
        ctx = ctx_ref[0]
        k2_scr[...] = _mm(ctx, wk2[...]).astype(dtype)
        v2_scr[...] = _mm(ctx, wv2[...]).astype(dtype)

    xt = xt_ref[0]  # (BQ, C)

    # ---- attn1: self attention ----
    xn = _ln(xt, ln1_s, ln1_b, dtype)
    q = _mm(xn, wq1[...]).astype(dtype)
    attn = _attend_self_t(q, k_scr[...], vt_scr, heads, scale, dtype)
    x1 = (xt.astype(jnp.float32) + _mm(attn, wo1[...]) + bo1[...]).astype(dtype)

    # ---- attn2: cross attention over the text tokens ----
    xn2 = _ln(x1, ln2_s, ln2_b, dtype)
    q2 = _mm(xn2, wq2[...]).astype(dtype)
    attn2 = _attend(q2, k2_scr[...], v2_scr[...], heads, scale, dtype)
    x2 = (x1.astype(jnp.float32) + _mm(attn2, wo2[...]) + bo2[...]).astype(dtype)

    # ---- ff: GEGLU ----
    xn3 = _ln(x2, ln3_s, ln3_b, dtype)
    hp = _mm(xn3, wff1[...]) + bff1[...]
    half = hp.shape[-1] // 2
    a = hp[:, :half]
    g = hp[:, half:]
    act = (a * _gelu_exact(g)).astype(dtype)
    y = x2.astype(jnp.float32) + _mm(act, wff2[...]) + bff2[...]
    y_ref[0] = y.astype(dtype)


def supported(s: int, c: int, heads: int, block_q: int = DEFAULT_BQ) -> bool:
    if c % heads or (c // heads) % 8:
        return False
    if c > MAX_FUSED_CHANNELS:
        return False
    return s % min(block_q, s) == 0


class TransformerWeights(NamedTuple):
    """Entry/exit of a whole Transformer3DModel around one block.

    ``gn_scale``/``gn_bias``: raw per-channel GroupNorm params (C,) — the
    per-frame statistics are computed inside the kernel from the resident
    frame (InflatedGroupNorm semantics, reference resnet.py:21-29);
    ``win``/``wout``: the 1x1 proj_in / proj_out convs as (C, C) matrices.
    """

    gn_scale: jnp.ndarray
    gn_bias: jnp.ndarray
    win: jnp.ndarray
    bin: jnp.ndarray
    block: BlockWeights
    wout: jnp.ndarray
    bout: jnp.ndarray


def _transformer_kernel(
    xt_ref, xf_ref, ctx_ref,
    gn_s, gn_b, mavg, mexp, win, bin_,
    ln1_s, ln1_b, wq1, wk1, wv1, wo1, bo1,
    ln2_s, ln2_b, wq2, wk2, wv2, wo2, bo2,
    ln3_s, ln3_b, wff1, bff1, wff2, bff2,
    wout, bout,
    y_ref,
    h_scr, k_scr, vt_scr, k2_scr, v2_scr,
    *, heads: int, scale: float, eps: float,
):
    """Whole Transformer3DModel: GN -> proj_in -> block -> proj_out
    -> +residual.  ``h_scr`` caches the frame's projected hidden states so
    K/V and every query tile read the identical values.  The per-frame
    GroupNorm statistics are computed in-kernel from the resident frame
    (lane-aligned per-channel moments combined through the tiny constant
    ``mavg``/``mexp`` matrices — no extra HBM pass over the activation)."""
    qi = pl.program_id(1)
    dtype = xt_ref.dtype
    bq = xt_ref.shape[1]

    @pl.when(qi == 0)
    def _():
        xf = xf_ref[0].astype(jnp.float32)
        s1 = jnp.mean(xf, axis=0, keepdims=True)             # (1, C)
        s2 = jnp.mean(jnp.square(xf), axis=0, keepdims=True)
        g1 = jnp.dot(s1, mavg[...], preferred_element_type=jnp.float32)
        g2 = jnp.dot(s2, mavg[...], preferred_element_type=jnp.float32)
        var = jnp.maximum(g2 - jnp.square(g1), 0.0)
        rstd = jax.lax.rsqrt(var + eps)                      # (1, G)
        mean_c = jnp.dot(g1, mexp[...], preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(rstd, mexp[...], preferred_element_type=jnp.float32)
        gw = rstd_c * gn_s[...]
        gb = gn_b[...] - mean_c * gw
        xn = xf * gw + gb
        h_full = _mm(xn.astype(dtype), win[...]) + bin_[...]
        h_scr[...] = h_full.astype(dtype)
        hn_full = _ln(h_scr[...], ln1_s, ln1_b, dtype)
        k_scr[...] = _mm(hn_full, wk1[...]).astype(dtype)
        vt_scr[...] = jnp.transpose(
            _mm(hn_full, wv1[...]).astype(dtype), (1, 0)
        )
        ctx = ctx_ref[0]
        k2_scr[...] = _mm(ctx, wk2[...]).astype(dtype)
        v2_scr[...] = _mm(ctx, wv2[...]).astype(dtype)

    xt = h_scr[pl.ds(qi * bq, bq), :]

    # ---- attn1: self attention ----
    xn = _ln(xt, ln1_s, ln1_b, dtype)
    q = _mm(xn, wq1[...]).astype(dtype)
    attn = _attend_self_t(q, k_scr[...], vt_scr, heads, scale, dtype)
    x1 = (xt.astype(jnp.float32) + _mm(attn, wo1[...]) + bo1[...]).astype(dtype)

    # ---- attn2: cross attention over the text tokens ----
    xn2 = _ln(x1, ln2_s, ln2_b, dtype)
    q2 = _mm(xn2, wq2[...]).astype(dtype)
    attn2 = _attend(q2, k2_scr[...], v2_scr[...], heads, scale, dtype)
    x2 = (x1.astype(jnp.float32) + _mm(attn2, wo2[...]) + bo2[...]).astype(dtype)

    # ---- ff: GEGLU ----
    xn3 = _ln(x2, ln3_s, ln3_b, dtype)
    hp = _mm(xn3, wff1[...]) + bff1[...]
    half = hp.shape[-1] // 2
    act = (hp[:, :half] * _gelu_exact(hp[:, half:])).astype(dtype)
    x3 = (x2.astype(jnp.float32) + _mm(act, wff2[...]) + bff2[...]).astype(dtype)

    # ---- proj_out + residual ----
    y = _mm(x3, wout[...]) + bout[...]
    y_ref[0] = (y + xt_ref[0].astype(jnp.float32)).astype(dtype)


def fused_spatial_transformer(
    x: jnp.ndarray,
    ctx: jnp.ndarray,
    w: TransformerWeights,
    *,
    heads: int,
    groups: int,
    eps: float = 1e-6,
    block_q: int = DEFAULT_BQ,
) -> jnp.ndarray:
    """Run a whole single-layer Transformer3DModel over (BF, S, C) with text
    context (BF, T, ctx_dim); the per-frame GroupNorm (stats included) runs
    inside the kernel.  Check :func:`supported` first.  Forward-only."""
    from motionclone_tpu.ops.fused_resnet import _group_matrices

    bf, s, c = x.shape
    t = ctx.shape[1]
    if not supported(s, c, heads, block_q):
        raise ValueError(f"unsupported fused transformer shape {x.shape}")
    bq = min(block_q, s)
    nq = pl.cdiv(s, bq)
    d = c // heads
    scale = d**-0.5

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bi, qi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    dtype = x.dtype
    mavg, mexp = _group_matrices(c, groups)
    entry = [
        jnp.asarray(w.gn_scale, jnp.float32).reshape(1, -1),
        jnp.asarray(w.gn_bias, jnp.float32).reshape(1, -1),
        mavg, mexp,
        jnp.asarray(w.win, dtype), jnp.asarray(w.bin, jnp.float32).reshape(1, -1),
    ]
    blockw = [
        jnp.asarray(a, dtype=dtype) if a.ndim == 2
        else jnp.asarray(a, jnp.float32).reshape(1, -1)
        for a in w.block
    ]
    exit_w = [
        jnp.asarray(w.wout, dtype), jnp.asarray(w.bout, jnp.float32).reshape(1, -1),
    ]
    in_specs = [
        pl.BlockSpec((1, bq, c), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, c), lambda bi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ctx.shape[-1]), lambda bi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [w_spec(a) for a in entry + blockw + exit_w]

    return pl.pallas_call(
        functools.partial(
            _transformer_kernel, heads=heads, scale=scale, eps=eps
        ),
        grid=(bf, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bf, s, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((s, c), dtype),
            pltpu.VMEM((s, c), dtype),
            pltpu.VMEM((c, s), dtype),  # V^T for the transposed attention
            pltpu.VMEM((t, c), dtype),
            pltpu.VMEM((t, c), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bf * s * s * c + 20 * bf * s * c * c,
            bytes_accessed=4 * bf * s * c * dtype.itemsize,
            transcendentals=bf * heads * s * (s + t),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, x, ctx, *entry, *blockw, *exit_w)


def fused_transformer_block(
    x: jnp.ndarray,
    ctx: jnp.ndarray,
    w: BlockWeights,
    *,
    heads: int,
    block_q: int = DEFAULT_BQ,
) -> jnp.ndarray:
    """Run one spatial transformer block over (BF, S, C) with text context
    (BF, T, ctx_dim).  Check :func:`supported` first.  Forward-only."""
    bf, s, c = x.shape
    t = ctx.shape[1]
    if not supported(s, c, heads, block_q):
        raise ValueError(f"unsupported fused block shape {x.shape}")
    bq = min(block_q, s)
    nq = pl.cdiv(s, bq)
    d = c // heads
    scale = d**-0.5

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bi, qi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    # 2D weights in compute dtype; 1D params in f32, reshaped (1, n) so the
    # VMEM blocks are 2D (lane-major) and broadcast against (BQ, n) tiles
    weights = [
        jnp.asarray(a, dtype=x.dtype) if a.ndim == 2
        else jnp.asarray(a, jnp.float32).reshape(1, -1)
        for a in w
    ]
    in_specs = [
        pl.BlockSpec((1, bq, c), lambda bi, qi: (bi, qi, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, c), lambda bi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, ctx.shape[-1]), lambda bi, qi: (bi, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [w_spec(a) for a in weights]

    return pl.pallas_call(
        functools.partial(_kernel, heads=heads, scale=scale),
        grid=(bf, nq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, c), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bf, s, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((s, c), x.dtype),
            pltpu.VMEM((c, s), x.dtype),  # V^T for the transposed attention
            pltpu.VMEM((t, c), x.dtype),
            pltpu.VMEM((t, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bf * s * s * c + 16 * bf * s * c * c,
            bytes_accessed=4 * bf * s * c * x.dtype.itemsize,
            transcendentals=bf * heads * s * (s + t),
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, x, ctx, *weights)
