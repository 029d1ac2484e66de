"""Pallas TPU kernel for per-pixel temporal self-attention.

The motion module attends over F frames *independently at every spatial
position* (reference motion_module.py:279 rearranges ``(b f) d c ->
(b d) f c`` and runs thousands of tiny f x f attentions).  Lowered naively,
that is a batch of 16x16xD matmuls — far too small for the MXU — plus two
full-tensor transposes per attention block, which dominate the module's
runtime on TPU (measured: ~40% of the whole UNet forward at 512^2).

This kernel removes both costs with *block-diagonal packing*: a tile of
``TS`` spatial positions x F frames is read in its natural (B, F, S, C)
memory order — no transposes anywhere — and flattened to a (TS*F, D) matrix
whose rows interleave pixels (row ``r = f*TS + s``).  One (TS*F, TS*F) MXU
matmul computes all TS pixels' logit blocks at once; entries mixing
different pixels (``r % TS != c % TS``) are masked to -inf before the
softmax, so ``P @ V`` is exactly the per-pixel attention.  The extra FLOPs
(factor TS on an already tiny matmul) are trivial next to the transposes
and relayouts saved.

Forward saves the row log-sum-exp; the custom VJP recomputes probabilities
per tile (standard flash backward, but with no cross-tile reductions since
keys never leave their pixel) — gradients are required because temporal
attention sits inside the motion-guidance differentiation path
(reference motionclone_functions.py:236).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
TILE_SPATIAL = 16  # rows = F * TILE_SPATIAL; 16 matches bf16 sublane tiling


def _pixel_mask(rows_q: int, rows_k: int, ts: int) -> jnp.ndarray:
    """(rows_q, rows_k) bool: True where row and col share a spatial
    position (row ``r = f*ts + s`` interleaves pixels, so the position is
    ``r % ts`` on both sides — also for rectangular q/k frame counts)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows_q, rows_k), 1)
    return (r % ts) == (c % ts)


def _attend_head(q, k, v, scale, mask):
    """One head's masked attention: (rows_q, d) x (rows_k, d) -> (out, lse)."""
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    logits = jnp.where(mask, logits, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    exp = jnp.exp(logits - m)
    l = jnp.sum(exp, axis=-1, keepdims=True)
    p = (exp / l).astype(v.dtype)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)
    return out, (m + jnp.log(l))[:, 0]


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *,
                scale: float, ts: int, heads: int):
    f, _, hd = q_ref.shape[1:]
    fk = k_ref.shape[1]
    d = hd // heads
    rows = f * ts
    q = q_ref[0].reshape(rows, hd)
    k = k_ref[0].reshape(fk * ts, hd)
    v = v_ref[0].reshape(fk * ts, hd)
    mask = _pixel_mask(rows, fk * ts, ts)
    # per-head stores keep only one head's f32 temporaries live at a time
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        out_h, lse_h = _attend_head(
            q[:, sl].astype(jnp.float32), k[:, sl].astype(jnp.float32),
            v[:, sl], scale, mask,
        )
        o_ref[0, :, :, sl] = out_h.reshape(f, ts, d).astype(o_ref.dtype)
        lse_ref[0, 0, h] = lse_h


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float, ts: int, heads: int):
    f, _, hd = q_ref.shape[1:]
    fk = k_ref.shape[1]
    d = hd // heads
    rows = f * ts
    q = q_ref[0].reshape(rows, hd)
    k = k_ref[0].reshape(fk * ts, hd)
    v = v_ref[0].reshape(fk * ts, hd)
    do = do_ref[0].reshape(rows, hd)
    mask = _pixel_mask(rows, fk * ts, ts)
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl].astype(jnp.float32)
        kh = k[:, sl].astype(jnp.float32)
        vh = v[:, sl].astype(jnp.float32)
        doh = do[:, sl].astype(jnp.float32)
        lse = lse_ref[0, 0, h][:, None]
        logits = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        logits = jnp.where(mask, logits, NEG_INF)
        p = jnp.exp(logits - lse)  # off-pixel entries are exactly 0
        # recompute out = p @ v instead of saving it (HBM residual saving:
        # delta = rowsum(do * out) = rowsum(do * (p @ v)))
        outh = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        delta = jnp.sum(doh * outh, axis=-1, keepdims=True)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta) * scale
        dq_h = jnp.dot(ds, kh, preferred_element_type=jnp.float32)
        dk_h = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dv_h = jax.lax.dot_general(
            p, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq_ref[0, :, :, sl] = dq_h.reshape(f, ts, d).astype(dq_ref.dtype)
        dk_ref[0, :, :, sl] = dk_h.reshape(fk, ts, d).astype(dk_ref.dtype)
        dv_ref[0, :, :, sl] = dv_h.reshape(fk, ts, d).astype(dv_ref.dtype)


def _specs(b, f, fk, s, hd, heads, ts):
    grid = (b, s // ts)
    x_spec = pl.BlockSpec(
        (1, f, ts, hd), lambda bi, si: (bi, 0, si, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, fk, ts, hd), lambda bi, si: (bi, 0, si, 0), memory_space=pltpu.VMEM
    )
    lse_spec = pl.BlockSpec(
        (1, 1, heads, f * ts), lambda bi, si: (bi, si, 0, 0),
        memory_space=pltpu.VMEM,
    )
    return grid, x_spec, kv_spec, lse_spec


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _temporal_fwd(q, k, v, scale: float, ts: int, heads: int):
    b, f, s, hd = q.shape
    fk = k.shape[1]
    grid, x_spec, kv_spec, lse_spec = _specs(b, f, fk, s, hd, heads, ts)
    d = hd // heads
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, ts=ts, heads=heads),
        grid=grid,
        in_specs=[x_spec, kv_spec, kv_spec],
        out_specs=[x_spec, lse_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((b, s // ts, heads, f * ts), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * (s // ts) * (f * ts) * (fk * ts) * d,
            bytes_accessed=4 * b * (f + fk) * s * hd,
            transcendentals=b * heads * s * f * fk,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


def _temporal_bwd(q, k, v, lse, do, scale: float, ts: int, heads: int):
    b, f, s, hd = q.shape
    fk = k.shape[1]
    grid, x_spec, kv_spec, lse_spec = _specs(b, f, fk, s, hd, heads, ts)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, ts=ts, heads=heads),
        grid=grid,
        in_specs=[x_spec, kv_spec, kv_spec, x_spec, lse_spec],
        out_specs=[x_spec, kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v, do, lse)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _temporal_attention(q, k, v, scale, ts, heads):
    out, _ = _temporal_fwd(q, k, v, scale, ts, heads)
    return out


def _fwd_rule(q, k, v, scale, ts, heads):
    out, lse = _temporal_fwd(q, k, v, scale, ts, heads)
    return out, (q, k, v, lse)


def _bwd_rule(scale, ts, heads, res, do):
    q, k, v, lse = res
    return _temporal_bwd(q, k, v, lse, do, scale, ts, heads)


_temporal_attention.defvjp(_fwd_rule, _bwd_rule)


def supported(f: int, s: int, ts: int = TILE_SPATIAL) -> bool:
    """Kernel applicability: spatial extent must tile evenly and the packed
    tile must reach one MXU pass."""
    return s % ts == 0 and f * ts >= 128


def pick_tile(f: int, s: int, max_ts: int = 128):
    """Smallest spatial tile with ``f * ts >= 128`` (one MXU pass of query
    rows) that divides ``s``, or None.  Small local frame counts — e.g. 2
    frames per chip under frame sharding — need wider tiles than the
    default 16 to fill the MXU."""
    ts = TILE_SPATIAL
    while ts <= max_ts:
        if supported(f, s, ts):
            return ts
        ts *= 2
    return None


def temporal_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    heads: int,
    scale: float,
    ts: int = TILE_SPATIAL,
) -> jnp.ndarray:
    """Per-pixel temporal attention over (B, F, S, heads*D) tensors.

    Equivalent to softmax(q_s k_s^T * scale) v_s run independently per
    spatial position s and head, with q/k/v kept in their natural layout.
    ``k``/``v`` may carry a different (larger) frame count than ``q`` —
    the rectangular form used under frame sharding, where the local
    queries attend to the all_gathered global keys/values.  Check
    :func:`supported` (with q's frame count) before calling.
    """
    b, f, s, hd = q.shape
    if k.shape != v.shape or k.shape[0] != b or k.shape[2:] != (s, hd):
        raise ValueError(f"k/v shape {k.shape} incompatible with q {q.shape}")
    if not supported(f, s, ts):
        raise ValueError(f"unsupported temporal attention shape {q.shape}")
    if hd % heads:
        raise ValueError(f"head count {heads} does not divide dim {hd}")
    return _temporal_attention(q, k, v, scale, ts, heads)
