"""Fully fused temporal motion module as one Pallas TPU kernel.

A ``VanillaTemporalModule`` (reference motion_module.py:51-225) is, in XLA,
~20 HBM passes over the activation: GroupNorm stats+normalize, proj_in, and
per attention sublayer a LayerNorm, positional-encoding add, q/k/v
projections, the attention kernel (3 reads + 1 write), and the output
projection+residual; then the LN+GEGLU feed-forward and proj_out+residual.
At 512^2 each 64x64 module costs ~8 ms, almost all of it bandwidth
(PERF.md: effective elementwise bandwidth ~100-270 GB/s).

This kernel runs everything after the GroupNorm *statistics* in one pass:

    x -> GN-affine -> proj_in -> [LN -> +PE -> qkv -> per-pixel attention
      -> out-proj -> +res] x n_attn -> LN -> GEGLU FF -> +res -> proj_out
      -> + x

reading ``x`` once and writing the module output once.  The GroupNorm
moments are per (sample, frame) over all pixels (InflatedGroupNorm,
reference resnet.py:21-29) — they span every spatial tile, so the caller
computes them with one cheap XLA reduction and passes the folded per-(f, c)
affine ``w, b`` (normalize = ``x * w[f] + b[f]``).

Per-pixel temporal attention reuses the block-diagonal packing of
ops/temporal_attention.py: a (F, TS, C) tile flattens to (F*TS, C) rows in
natural memory order, one MXU matmul computes all TS pixels' f x f logit
blocks, and entries mixing different pixels are masked before the softmax.

Forward-only by design: the non-differentiated UNet passes (unconditional
CFG branch, vanilla phase) use it; extraction and the guided pass (which
need the probability maps and gradients) keep the unfused path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from motionclone_tpu.ops.fused_block import LOGIT_CLIP, _gelu_exact, _mm

TILE_SPATIAL = 16
LN_EPS = 1e-5
MAX_CHANNELS = 640  # weight residency budget (18*C^2 bf16 <= ~15 MB)


class AttnWeights(NamedTuple):
    ln_scale: jnp.ndarray
    ln_bias: jnp.ndarray
    wq: jnp.ndarray
    wk: jnp.ndarray
    wv: jnp.ndarray
    wo: jnp.ndarray
    bo: jnp.ndarray


class TemporalModuleWeights(NamedTuple):
    gn_w: jnp.ndarray  # (B, F, C) folded GroupNorm affine: x*w + b
    gn_b: jnp.ndarray
    pe: Optional[jnp.ndarray]  # (F, C) positional encoding or None
    win: jnp.ndarray  # (C, C) proj_in
    bin: jnp.ndarray
    attn: Tuple[AttnWeights, ...]
    ffln_scale: jnp.ndarray
    ffln_bias: jnp.ndarray
    wff1: jnp.ndarray  # (C, 8*C) GEGLU
    bff1: jnp.ndarray
    wff2: jnp.ndarray  # (4*C, C)
    bff2: jnp.ndarray
    wout: jnp.ndarray  # (C, C) proj_out
    bout: jnp.ndarray


def _ln(hf, scale_ref, bias_ref):
    mean = jnp.mean(hf, axis=-1, keepdims=True)
    mean2 = jnp.mean(jnp.square(hf), axis=-1, keepdims=True)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return (hf - mean) * rstd * scale_ref[...] + bias_ref[...]


def _pixel_mask(rows: int, ts: int) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    return (r % ts) == (c % ts)


def _attend(q, k, v, heads, scale, ts, dtype):
    """Per-pixel masked attention over packed (rows, C) tiles.

    Maxless softmax: logits clamped to +-LOGIT_CLIP (exact for |logits| <=
    75, graceful flattening beyond — see ops/fused_block.py); cross-pixel
    entries are zeroed *after* the exp so masking is exact regardless of
    clipping, and the 1/sum normalizer is folded into the (rows, d) output.
    The row-max reduction this removes is ~40% of attention time on v5e."""
    rows, c = q.shape
    d = c // heads
    mask = _pixel_mask(rows, ts)
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        e = jnp.where(
            mask, jnp.exp(jnp.clip(logits, -LOGIT_CLIP, LOGIT_CLIP)), 0.0
        )
        r = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
        outs.append(
            jnp.dot(e.astype(dtype), v[:, sl],
                    preferred_element_type=jnp.float32) * r
        )
    return jnp.concatenate(outs, axis=-1)


def _kernel(
    x_ref, gnw_ref, gnb_ref, pe_ref, win, bin_,
    *rest,
    y_ref,
    heads: int, scale: float, n_attn: int, ts: int, has_pe: bool,
):
    attn_w = [rest[i * 7 : (i + 1) * 7] for i in range(n_attn)]
    (ffln_s, ffln_b, wff1, bff1, wff2, bff2, wout, bout) = rest[n_attn * 7 :]

    f, tsz, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    rows = f * tsz
    dtype = x_ref.dtype

    x = x_ref[0]  # (F, TS, C)
    xf = x.reshape(rows, c).astype(jnp.float32)

    # GroupNorm affine (stats folded outside); ``gnw``/``gnb`` arrive
    # pre-repeated to per-row (F*TS, C) — Mosaic supports the 3D->2D
    # collapse above but not rank-expanding (F, C) -> (F, 1, C) casts
    h0 = xf * gnw_ref[0] + gnb_ref[0]

    h = _mm(h0.astype(dtype), win[...]) + bin_[...]

    for i in range(n_attn):
        ln_s, ln_b, wq, wk, wv, wo, bo = attn_w[i]
        hn = _ln(h, ln_s, ln_b)
        if has_pe:
            hn = hn + pe_ref[...]  # pre-repeated per-row (F*TS, C)
        hn = hn.astype(dtype)
        q = _mm(hn, wq[...]).astype(dtype)
        k = _mm(hn, wk[...]).astype(dtype)
        v = _mm(hn, wv[...]).astype(dtype)
        attn = _attend(q, k, v, heads, scale, ts, dtype)
        h = h + _mm(attn.astype(dtype), wo[...]) + bo[...]

    hn = _ln(h, ffln_s, ffln_b).astype(dtype)
    hp = _mm(hn, wff1[...]) + bff1[...]
    half = hp.shape[-1] // 2
    act = (hp[:, :half] * _gelu_exact(hp[:, half:])).astype(dtype)
    h = h + _mm(act, wff2[...]) + bff2[...]

    y = _mm(h.astype(dtype), wout[...]) + bout[...]
    y_ref[0] = (xf + y).reshape(f, tsz, c).astype(dtype)


def supported(f: int, s: int, c: int, heads: int, ts: int = TILE_SPATIAL) -> bool:
    if c > MAX_CHANNELS or c % heads or (c // heads) % 8:
        return False
    return s % ts == 0 and f * ts >= 128


def fused_temporal_module(
    x: jnp.ndarray,
    w: TemporalModuleWeights,
    *,
    heads: int,
    ts: int = TILE_SPATIAL,
) -> jnp.ndarray:
    """Run one motion module over (B, F, S, C) -> (B, F, S, C).

    Check :func:`supported` first.  Forward-only (no VJP).
    """
    b, f, s, c = x.shape
    dtype = x.dtype
    n_attn = len(w.attn)
    scale = (c // heads) ** -0.5
    has_pe = w.pe is not None

    def vec(a):
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    def mat(a):
        return jnp.asarray(a, dtype)

    rows = f * ts
    # pre-repeat per-frame terms to per-row (kernel tiles pack (F, TS) rows;
    # Mosaic has no rank-expanding reshape for an in-kernel broadcast)
    pe = (
        jnp.repeat(mat(w.pe), ts, axis=0)
        if has_pe
        else jnp.zeros((rows, c), dtype)
    )
    gn_w = jnp.repeat(jnp.asarray(w.gn_w, jnp.float32), ts, axis=1)
    gn_b = jnp.repeat(jnp.asarray(w.gn_b, jnp.float32), ts, axis=1)

    weights = [mat(w.win), vec(w.bin)]
    for aw in w.attn:
        weights += [
            vec(aw.ln_scale), vec(aw.ln_bias),
            mat(aw.wq), mat(aw.wk), mat(aw.wv), mat(aw.wo), vec(aw.bo),
        ]
    weights += [
        vec(w.ffln_scale), vec(w.ffln_bias),
        mat(w.wff1), vec(w.bff1), mat(w.wff2), vec(w.bff2),
        mat(w.wout), vec(w.bout),
    ]

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bi, si: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    x_spec = pl.BlockSpec((1, f, ts, c), lambda bi, si: (bi, 0, si, 0),
                          memory_space=pltpu.VMEM)
    gn_spec = pl.BlockSpec((1, rows, c), lambda bi, si: (bi, 0, 0),
                           memory_space=pltpu.VMEM)
    pe_spec = pl.BlockSpec((rows, c), lambda bi, si: (0, 0),
                           memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, heads=heads, scale=scale, n_attn=n_attn, ts=ts, has_pe=has_pe,
    )

    def wrapped(*refs):
        kernel(*refs[:-1], y_ref=refs[-1])

    return pl.pallas_call(
        wrapped,
        grid=(b, s // ts),
        in_specs=[x_spec, gn_spec, gn_spec, pe_spec]
        + [w_spec(a) for a in weights],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * s * (18 * c * c)
            + 4 * b * (s // ts) * heads * (f * ts) ** 2 * (c // heads),
            bytes_accessed=4 * b * f * s * c,
            transcendentals=b * s * f * f * heads,
        ),
        interpret=jax.default_backend() != "tpu",
    )(x, gn_w, gn_b, pe, *weights)


def folded_groupnorm_affine(
    x: jnp.ndarray, num_groups: int, eps: float,
    scale: jnp.ndarray, bias: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(sample, frame) GroupNorm folded to a per-channel affine.

    One XLA reduction pass over ``x`` (B, F, S, C); returns (w, b) with
    ``normalize(x)[b,f,s,c] = x * w[b,f,c] + b[b,f,c]``.
    """
    bsz, f, s, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=2)              # (B, F, C)
    s2 = jnp.mean(jnp.square(xf), axis=2)
    g1 = jnp.mean(s1.reshape(bsz, f, num_groups, cg), axis=-1)
    g2 = jnp.mean(s2.reshape(bsz, f, num_groups, cg), axis=-1)
    var = jnp.maximum(g2 - jnp.square(g1), 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.repeat(g1, cg, axis=-1)   # (B, F, C)
    rstd_c = jnp.repeat(rstd, cg, axis=-1)
    w = rstd_c * scale.astype(jnp.float32)[None, None, :]
    b = bias.astype(jnp.float32)[None, None, :] - mean_c * w
    return w, b
