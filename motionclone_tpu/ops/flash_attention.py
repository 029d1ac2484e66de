"""Pallas TPU flash attention (forward + backward), the spatial-attention
hot path.

Replaces xformers' ``memory_efficient_attention`` CUDA kernels (reference
attention.py:535-542, SURVEY §2.4) with TPU-native kernels.  Shapes here are
MotionClone's: long self-attention is the per-frame spatial attention at
64x64 latents — seq 4096, head dim 40/80 — so keys/values for one
(batch, head) fit comfortably in VMEM (<= 2 MB padded).  That permits a
simplified flash scheme:

* forward: grid over (batch*heads, q-blocks); each program loads its q block
  plus the full K/V, computes a BQ x S logit tile in f32, log-sum-exp
  normalizes, and writes the output block and the LSE residual.  Peak VMEM
  is the logit tile (BQ x S x 4 bytes), not O(S^2).
* backward: two kernels — dq over q-blocks and dk/dv over kv-blocks — each
  recomputing probabilities from (q, k, lse), the standard flash backward
  with ``delta = rowsum(dout * out)``.

Head dims are zero-padded to the 128-lane width outside the kernels; the MXU
pads to 128 lanes regardless, so this costs no extra compute, and zero
columns change neither logits nor outputs.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_BQ = 256
DEFAULT_BK = 512


def _pad_head_dim(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    d = x.shape[-1]
    pad = (-d) % LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
    return x, d


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (BQ, D)
    k = k_ref[0].astype(jnp.float32)  # (S, D)
    v = v_ref[0]  # (S, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, S)
    m = jnp.max(logits, axis=-1, keepdims=True)
    exp = jnp.exp(logits - m)
    l = jnp.sum(exp, axis=-1, keepdims=True)
    lse_ref[0] = m + jnp.log(l)
    probs = (exp / l).astype(v.dtype)
    o_ref[0] = jnp.dot(probs, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _flash_fwd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, block_q: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q/k/v: (BH, S, D) padded to lane width. Returns (out, lse)."""
    bh, sq, d = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    grid = (bh, pl.cdiv(sq, bq))
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, sq, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * sq * sk * d,
            bytes_accessed=2 * bh * (sq + 2 * sk) * d * q.dtype.itemsize,
            transcendentals=bh * sq * sk,
        ),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
                   acc_ref, *, scale: float):
    """Accumulates dq over kv blocks: grid (BH, nq, nk), kv minor."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)
    lse = lse_ref[0]                      # (BQ, 1)
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                              # (BQ, BK)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale
    acc_ref[...] += jnp.dot(ds, k, preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dk_ref, dv_ref, dk_acc, dv_acc, *, scale: float):
    """Accumulates dk/dv over q blocks: grid (BH, nk, nq), q minor."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(i == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0].astype(jnp.float32)      # (BQ, D)
    k = k_ref[0].astype(jnp.float32)      # (BK, D)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)    # (BQ, D)
    lse = lse_ref[0]                      # (BQ, 1)
    delta = delta_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale                              # (BQ, BK)
    p = jnp.exp(s - lse)
    dv_acc[...] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                      # (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                      # (BQ, BK)
    ds = p * (dp - delta) * scale
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd(q, k, v, out, lse, do, scale: float, block_q: int, block_k: int):
    bh, sq, d = q.shape
    sk = k.shape[1]
    delta = jnp.sum(
        do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, SQ, 1)

    bq = min(block_q, sq)
    bk = min(block_k, sk)
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bh, sq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32)],
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, d), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, d), lambda b, j, i: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk, d), jnp.float32),
            pltpu.VMEM((bk, d), jnp.float32),
        ],
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_bhsd(q, k, v, scale, block_q, block_k):
    out, _ = _flash_fwd(q, k, v, scale, block_q)
    return out


def _flash_attention_fwd_rule(q, k, v, scale, block_q, block_k):
    out, lse = _flash_fwd(q, k, v, scale, block_q)
    return out, (q, k, v, out, lse)


def _flash_attention_bwd_rule(scale, block_q, block_k, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _flash_bwd(q, k, v, out, lse, do, scale, block_q, block_k)
    return dq, dk, dv


_flash_attention_bhsd.defvjp(_flash_attention_fwd_rule, _flash_attention_bwd_rule)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
) -> jnp.ndarray:
    """Differentiable flash attention over (batch, seq, heads, head_dim)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]

    def to_bhsd(x, s):
        x = x.transpose(0, 2, 1, 3).reshape(b * h, s, x.shape[-1])
        return _pad_head_dim(x)[0]

    qf = to_bhsd(q, sq)
    kf = to_bhsd(k, sk)
    vf = to_bhsd(v, sk)
    out = _flash_attention_bhsd(qf, kf, vf, scale, block_q, block_k)
    out = out[..., :d].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
