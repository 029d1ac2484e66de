"""Pallas TPU flash attention for the spatial (per-frame) attention path.

Replaces xformers' ``memory_efficient_attention`` CUDA kernels (reference
attention.py:535-542, SURVEY §2.4) with TPU-native kernels, shaped for
MotionClone's spatial self-attention: seq 4096 @ 64x64 latents with
head_dim 40, seq 1024 @ 32x32 with head_dim 80.

Design notes, driven by v5e measurements:

* XLA's einsum formulation relayouts q/k to a (B, H, D, S) layout first;
  those transposes cost ~7 ms each at 64x64 — more than the attention math
  itself.  These kernels therefore consume q/k/v in their **natural
  (B, S, heads*D) layout** — the direct output of the to_q/to_k/to_v
  projections — splitting heads by static lane slices inside the kernel.
  No transposes, no pad-to-128 HBM copies.
* Standard online-softmax streaming over key blocks (the flash scheme):
  running (max, sum, acc) scratch per head keeps every VMEM buffer a few
  hundred KB regardless of sequence length.
* Backward recomputes probabilities from the saved row log-sum-exp: dq
  streams over key blocks, dk/dv over query blocks, with f32 accumulators
  in scratch.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Swept on v5e at 64x64/16f: whole-sequence key blocks (the full K/V for
# one batch element is only ~2.6 MB) with narrow query tiles minimize the
# per-(cell, head) overhead; the raised vmem_limit_bytes below makes the
# f32 logit temporaries fit.
DEFAULT_BQ = 128
DEFAULT_BK = 4096
DEFAULT_WHOLE_BQ = 512
DEFAULT_BWD_BQ = 256
DEFAULT_BWD_BK = 2048
# K/V element count up to which the merged whole-KV backward (K/V + f32
# dk/dv accumulators resident in VMEM) is used instead of streaming tiles
WHOLE_BWD_MAX_ELEMS = 2 * 1024 * 1024
NEG_INF = -1e30
# Maxless softmax clamp (see ops/fused_block.py): exact for |logits| <= 75,
# graceful flattening beyond; removes the row-max lane reduction (~40% of
# attention time on v5e) and keeps the saved LSE consistent between the
# whole-KV forward and the backward recompute.
LOGIT_CLIP = 75.0


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# v5e has 128 MB of VMEM; the default 16 MB scoped budget rejects the larger
# (faster) tiles, so raise the per-kernel cap and let Mosaic balance
# pipelining itself.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _dot_nt(a, b):  # (M, D) x (N, D) -> (M, N), f32
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _dot_tn(a, b):  # (M, N) x (M, D) -> (N, D), f32
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                *, scale: float, heads: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    hd = q_ref.shape[-1]
    d = hd // heads

    @pl.when(j == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        # clip to match the backward recompute: the op is defined as
        # softmax(clip(logits)) everywhere, so fwd/bwd stay consistent
        s = jnp.clip(
            _dot_nt(q[:, sl], k[:, sl]) * scale, -LOGIT_CLIP, LOGIT_CLIP
        )  # (BQ, BK) f32
        m_prev = m_scr[h]                        # (BQ,)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        corr = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_scr[h] = l_scr[h] * corr + jnp.sum(p, axis=-1)
        acc_scr[h] = acc_scr[h] * corr[:, None] + jnp.dot(
            p.astype(v.dtype), v[:, sl], preferred_element_type=jnp.float32
        )
        m_scr[h] = m_new

    @pl.when(j == nk - 1)
    def _():
        outs = [acc_scr[h] / l_scr[h][:, None] for h in range(heads)]
        o_ref[0] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(l_scr[...])


def _fwd_whole_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, vt_scr,
                      *, scale: float, heads: int):
    """Whole-sequence-KV forward: channels-major attention internals.

    ``logits^T = k @ q^T`` keeps the unavoidable head_dim-padded MXU
    contraction, but ``out^T = v^T @ e`` contracts over SK at full MXU
    efficiency, and the clipped maxless softmax removes the row-max
    reduction (11.4 -> 6.0 ms per 64x64x16f call, measured on v5e)."""
    qi = pl.program_id(1)
    hd = q_ref.shape[-1]
    d = hd // heads
    dtype = q_ref.dtype

    @pl.when(qi == 0)
    def _():
        vt_scr[...] = jnp.transpose(v_ref[0], (1, 0))  # (HD, SK)

    q = q_ref[0]
    k = k_ref[0]
    outs = []
    lses = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s_t = jax.lax.dot_general(
            k[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (SK, BQ)
        e = jnp.exp(jnp.clip(s_t, -LOGIT_CLIP, LOGIT_CLIP))
        l = jnp.sum(e, axis=0, keepdims=True)  # (1, BQ)
        o_t = jax.lax.dot_general(
            vt_scr[sl, :], e.astype(dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (d, BQ)
        outs.append(o_t * (1.0 / l))
        lses.append(jnp.log(l))
    o_ref[0] = jnp.transpose(
        jnp.concatenate(outs, axis=0), (1, 0)
    ).astype(dtype)
    lse_ref[0] = jnp.concatenate(lses, axis=0)  # (heads, BQ)


def _flash_fwd_whole(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    heads: int, block_q: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, sq, hd = q.shape
    sk = k.shape[1]
    bq = min(block_q, sq)
    while sq % bq:  # partial final tiles would read undefined padded rows
        bq //= 2
    nq = pl.cdiv(sq, bq)
    return pl.pallas_call(
        functools.partial(_fwd_whole_kernel, scale=scale, heads=heads),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, bq), lambda bi, qi: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, heads, sq), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((hd, sk), q.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * hd,
            bytes_accessed=2 * b * (sq + 2 * sk) * hd * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v)


def _flash_fwd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
    heads: int, block_q: int, block_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q: (B, SQ, H*D), k/v: (B, SK, H*D).  Returns (out, lse)."""
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    if sk <= block_k:
        # the whole K/V fits VMEM: use the faster channels-major kernel
        return _flash_fwd_whole(q, k, v, scale, heads, DEFAULT_WHOLE_BQ)
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, heads=heads),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, hd), lambda bi, qi, ki: (bi, ki, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, hd), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, heads, bq), lambda bi, qi, ki: (bi, 0, qi),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, heads, sq), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, bq), jnp.float32),
            pltpu.VMEM((heads, bq), jnp.float32),
            pltpu.VMEM((heads, bq, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * sq * sk * hd,
            bytes_accessed=2 * b * (sq + 2 * sk) * hd * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref,
                   dq_scr, *, scale: float, heads: int):
    j = pl.program_id(2)
    nk = pl.num_programs(2)
    hd = q_ref.shape[-1]
    d = hd // heads

    @pl.when(j == 0)
    def _():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    out = o_ref[0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        doh = do[:, sl].astype(jnp.float32)
        s = _dot_nt(q[:, sl], k[:, sl]) * scale
        p = jnp.exp(jnp.clip(s, -LOGIT_CLIP, LOGIT_CLIP) - lse_ref[0, h][:, None])
        delta = jnp.sum(doh * out[:, sl].astype(jnp.float32), axis=-1,
                        keepdims=True)
        dp = _dot_nt(doh, v[:, sl].astype(jnp.float32))
        ds = p * (dp - delta) * scale
        dq_scr[h] += jnp.dot(ds.astype(k.dtype), k[:, sl],
                             preferred_element_type=jnp.float32)

    @pl.when(j == nk - 1)
    def _():
        dq_ref[0] = jnp.concatenate(
            [dq_scr[h] for h in range(heads)], axis=-1
        ).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                    dk_ref, dv_ref, dk_scr, dv_scr, *,
                    scale: float, heads: int):
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    hd = q_ref.shape[-1]
    d = hd // heads

    @pl.when(i == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    out = o_ref[0]
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        doh = do[:, sl].astype(jnp.float32)
        s = _dot_nt(q[:, sl], k[:, sl]) * scale  # (BQ, BK)
        p = jnp.exp(jnp.clip(s, -LOGIT_CLIP, LOGIT_CLIP) - lse_ref[0, h][:, None])
        dv_scr[h] += _dot_tn(p.astype(do.dtype), do[:, sl])
        delta = jnp.sum(doh * out[:, sl].astype(jnp.float32), axis=-1,
                        keepdims=True)
        dp = _dot_nt(doh, v[:, sl].astype(jnp.float32))
        ds = p * (dp - delta) * scale
        dk_scr[h] += _dot_tn(ds.astype(q.dtype), q[:, sl])

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = jnp.concatenate(
            [dk_scr[h] for h in range(heads)], axis=-1
        ).astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate(
            [dv_scr[h] for h in range(heads)], axis=-1
        ).astype(dv_ref.dtype)


def _bwd_whole_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                      dq_ref, dk_ref, dv_ref, dk_scr, dv_scr,
                      *, scale: float, heads: int):
    """Whole-sequence-KV merged backward: dq, dk, dv in one pass.

    The split dq / dkv kernels each recompute the head_dim-padded logits
    and dp dots; merging them halves the padded MXU work and the exp.
    Everything runs channels-major: s^T = k @ q^T and dp^T = v @ do^T keep
    the unavoidable head_dim contraction, while dq/dk/dv all contract over
    S or BQ at full MXU efficiency."""
    qi = pl.program_id(1)
    nq = pl.num_programs(1)
    hd = q_ref.shape[-1]
    d = hd // heads

    @pl.when(qi == 0)
    def _():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    out = o_ref[0]
    dqs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        s_t = jax.lax.dot_general(
            k[:, sl], q[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (SK, BQ)
        p_t = jnp.exp(
            jnp.clip(s_t, -LOGIT_CLIP, LOGIT_CLIP) - lse_ref[0, h][None, :]
        )
        doh = do[:, sl].astype(jnp.float32)
        dp_t = jax.lax.dot_general(
            v[:, sl], do[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (SK, BQ)
        delta = jnp.sum(
            doh * out[:, sl].astype(jnp.float32), axis=-1
        )  # (BQ,)
        ds_t = (p_t * (dp_t - delta[None, :]) * scale).astype(q.dtype)
        dqs.append(jax.lax.dot_general(
            ds_t, k[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ))  # (BQ, d), contraction over SK
        dk_scr[h] += jax.lax.dot_general(
            ds_t, q[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (SK, d), contraction over BQ
        dv_scr[h] += jax.lax.dot_general(
            p_t.astype(do.dtype), do[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dq_ref[0] = jnp.concatenate(dqs, axis=-1).astype(dq_ref.dtype)

    @pl.when(qi == nq - 1)
    def _():
        dk_ref[0] = jnp.concatenate(
            [dk_scr[h] for h in range(heads)], axis=-1
        ).astype(dk_ref.dtype)
        dv_ref[0] = jnp.concatenate(
            [dv_scr[h] for h in range(heads)], axis=-1
        ).astype(dv_ref.dtype)


def _flash_bwd_whole(q, k, v, out, lse, do, scale, heads, block_q):
    b, sq, hd = q.shape
    sk = k.shape[1]
    # bq must divide sq exactly: a partial final tile would feed undefined
    # padded q/do/lse rows into the shared dk/dv accumulators
    bq = min(block_q, sq)
    while sq % bq:
        bq //= 2
    nq = pl.cdiv(sq, bq)
    q_blk = pl.BlockSpec((1, bq, hd), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, sk, hd), lambda bi, qi: (bi, 0, 0),
                          memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, heads, bq), lambda bi, qi: (bi, 0, qi),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_whole_kernel, scale=scale, heads=heads),
        grid=(b, nq),
        in_specs=[q_blk, kv_blk, kv_blk, q_blk, q_blk, lse_blk],
        out_specs=[q_blk, kv_blk, kv_blk],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
            jax.ShapeDtypeStruct((b, sk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, sk, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, sk, hd // heads), jnp.float32),
            pltpu.VMEM((heads, sk, hd // heads), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * sq * sk * hd,
            bytes_accessed=4 * b * (sq + sk) * hd * q.dtype.itemsize,
            transcendentals=b * heads * sq * sk,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v, do, out, lse)


def _flash_bwd(q, k, v, out, lse, do, scale, heads, block_q, block_k):
    sk = k.shape[1]
    hd = k.shape[-1]
    # whole-KV merged backward whenever K/V + f32 dk/dv accumulators fit
    # VMEM comfortably (covers every MotionClone spatial shape)
    if sk * hd <= WHOLE_BWD_MAX_ELEMS:
        return _flash_bwd_whole(q, k, v, out, lse, do, scale, heads,
                                DEFAULT_WHOLE_BQ)
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // heads
    bq = min(block_q, sq)
    bk = min(block_k, sk)
    nq = pl.cdiv(sq, bq)
    nk = pl.cdiv(sk, bk)

    q_blk = pl.BlockSpec((1, bq, hd), lambda bi, qi, ki: (bi, qi, 0),
                         memory_space=pltpu.VMEM)
    kv_blk = pl.BlockSpec((1, bk, hd), lambda bi, qi, ki: (bi, ki, 0),
                          memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, heads, bq), lambda bi, qi, ki: (bi, 0, qi),
                           memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, heads=heads),
        grid=(b, nq, nk),
        in_specs=[q_blk, kv_blk, kv_blk, q_blk, q_blk, lse_blk],
        out_specs=q_blk,
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q.dtype),
        scratch_shapes=[pltpu.VMEM((heads, bq, d), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v, do, out, lse)

    # q-side blocks iterate in the minor grid dim here
    q_blk2 = pl.BlockSpec((1, bq, hd), lambda bi, ki, qi: (bi, qi, 0),
                          memory_space=pltpu.VMEM)
    kv_blk2 = pl.BlockSpec((1, bk, hd), lambda bi, ki, qi: (bi, ki, 0),
                           memory_space=pltpu.VMEM)
    lse_blk2 = pl.BlockSpec((1, heads, bq), lambda bi, ki, qi: (bi, 0, qi),
                            memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, heads=heads),
        grid=(b, nk, nq),
        in_specs=[q_blk2, kv_blk2, kv_blk2, q_blk2, q_blk2, lse_blk2],
        out_specs=[kv_blk2, kv_blk2],
        out_shape=[
            jax.ShapeDtypeStruct((b, sk, hd), k.dtype),
            jax.ShapeDtypeStruct((b, sk, hd), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((heads, bk, d), jnp.float32),
            pltpu.VMEM((heads, bk, d), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=_interpret(),
    )(q, k, v, do, out, lse)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention_bsh(q, k, v, scale, heads, block_q, block_k,
                         bwd_block_q, bwd_block_k):
    out, _ = _flash_fwd(q, k, v, scale, heads, block_q, block_k)
    return out


def _fwd_rule(q, k, v, scale, heads, block_q, block_k, bwd_block_q,
              bwd_block_k):
    out, lse = _flash_fwd(q, k, v, scale, heads, block_q, block_k)
    return out, (q, k, v, out, lse)


def _bwd_rule(scale, heads, block_q, block_k, bwd_block_q, bwd_block_k,
              res, do):
    q, k, v, out, lse = res
    return _flash_bwd(q, k, v, out, lse, do, scale, heads, bwd_block_q,
                      bwd_block_k)


_flash_attention_bsh.defvjp(_fwd_rule, _bwd_rule)


def supported(q_shape, k_shape, heads: int, block_q: int = DEFAULT_BQ,
              block_k: int = DEFAULT_BK, bwd_block_q: int = DEFAULT_BWD_BQ,
              bwd_block_k: int = DEFAULT_BWD_BK) -> bool:
    """Mirrors the fwd/bwd dispatch: tiling divisibility is only required
    on the *streaming* paths; the whole-KV kernels accept any sequence
    (their query tile halves until it divides, e.g. S=2304 at 384x384)."""
    b, sq, hd = q_shape
    sk = k_shape[1]
    if hd % heads:
        return False
    d = hd // heads
    if d % 8:
        return False  # head slices must stay sublane-aligned lane ranges
    if 2 * min(block_k, sk) * hd * 2 > 24 * 1024 * 1024:
        return False  # double-buffered K/V block must leave VMEM headroom
    if sk > block_k and (sq % min(block_q, sq) or sk % min(block_k, sk)):
        return False  # streaming forward needs even tiles
    if sk * hd > WHOLE_BWD_MAX_ELEMS and (
        sq % min(bwd_block_q, sq) or sk % min(bwd_block_k, sk)
    ):
        return False  # streaming backward needs even tiles
    return True


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    heads: int,
    block_q: int = DEFAULT_BQ,
    block_k: int = DEFAULT_BK,
    bwd_block_q: int = DEFAULT_BWD_BQ,
    bwd_block_k: int = DEFAULT_BWD_BK,
) -> jnp.ndarray:
    """Differentiable exact attention over natural-layout (B, S, heads*D)
    tensors.  Check :func:`supported` first.  The backward kernels use
    their own (smaller) tile sizes: they hold extra f32 accumulators."""
    if not supported(q.shape, k.shape, heads, block_q, block_k,
                     bwd_block_q, bwd_block_k):
        raise ValueError(
            f"unsupported flash attention shapes q={q.shape} k={k.shape}"
        )
    return _flash_attention_bsh(q, k, v, scale, heads, block_q, block_k,
                                bwd_block_q, bwd_block_k)
