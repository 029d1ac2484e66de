"""Attention compute paths for TPU.

The reference's spatial/cross attention runs through xformers CUDA kernels or
a sliced baddbmm+softmax fallback (reference attention.py:461-542); here the
equivalents are:

* ``xla``     — one fused einsum/softmax/einsum; best for short sequences
                (cross-attn kv=77, temporal f=16, low-res spatial).
* ``chunked`` — query-chunked lax.scan that bounds the materialized logits to
                ``chunk x kv`` per head; O(n)-memory like xformers, fully
                differentiable through XLA AD.
* ``flash``   — Pallas TPU flash-attention kernel (ops/flash_attention.py)
                with a custom VJP; used for long spatial sequences.

All paths take tensors shaped ``(batch, seq, heads, head_dim)`` and compute
the softmax in float32 regardless of input dtype (bf16 compute policy).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

# Sequence length at/above which the chunked/flash paths are preferred.
_LONG_SEQ = 2048
_CHUNK = 1024


def _xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def _chunked_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float, chunk: int
) -> jnp.ndarray:
    """Query-chunked attention: logits materialized per chunk only."""
    b, sq, h, d = q.shape
    if sq % chunk != 0:
        return _xla_attention(q, k, v, scale)
    n_chunks = sq // chunk
    qc = q.reshape(b, n_chunks, chunk, h, d).transpose(1, 0, 2, 3, 4)

    def body(carry, q_blk):
        out = _xla_attention(q_blk, k, v, scale)
        return carry, out

    _, outs = jax.lax.scan(body, None, qc)
    return outs.transpose(1, 0, 2, 3, 4).reshape(b, sq, h, d)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: Optional[float] = None,
    impl: str = "auto",
) -> jnp.ndarray:
    """Multi-head attention over ``(batch, seq, heads, head_dim)`` tensors.

    ``impl``: "auto" | "xla" | "chunked" | "flash".
    "auto" picks xla for short sequences and flash (falling back to chunked
    off-TPU) for long ones.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    b, sq, h, d = q.shape
    sk = k.shape[1]

    if impl in ("auto", "grad-safe", "fused"):
        # "fused" selects the whole-block kernel in BasicTransformerBlock;
        # attention calls that still reach this dispatcher (unsupported
        # shapes, temporal fallbacks) use the same policy as "auto"
        # Measured on v5e in-model (512^2, 16 frames): with whole-sequence
        # key blocks the Pallas flash kernel beats the einsum path at every
        # self-attention shape (10.4 vs ~17 ms at 64x64 — XLA relayouts k
        # for ~7 ms per layer), and its custom VJP never materializes the
        # (B, H, S, S) probability tensor that overflows HBM in the guided
        # backward.  Cross-attention (kv = 77) and tiny shapes: einsum.
        impl = "flash" if (
            sq >= 256 and sk >= 256 and _default_backend_is_tpu()
        ) else "xla"

    if impl == "xla":
        return _xla_attention(q, k, v, scale)
    if impl == "chunked":
        return _chunked_attention(q, k, v, scale, _CHUNK)
    if impl == "flash":
        from motionclone_tpu.ops.flash_attention import flash_attention, supported

        if not supported((b, sq, h * d), (b, sk, h * d), h):
            # graceful fallback for shapes the kernel cannot tile
            return _xla_attention(q, k, v, scale)
        out = flash_attention(
            q.reshape(b, sq, h * d),
            k.reshape(b, sk, h * d),
            v.reshape(b, sk, h * d),
            scale=scale,
            heads=h,
        )
        return out.reshape(b, sq, h, d)
    raise ValueError(f"unknown attention impl: {impl}")


@functools.cache
def _default_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def flash_available(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Whether impl="flash" would accept these (b, s, h, d) tensors."""
    from motionclone_tpu.ops.flash_attention import supported

    b, sq, h, d = q.shape
    return supported((b, sq, h * d), (b, k.shape[1], h * d), h)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, scale: Optional[float] = None) -> jnp.ndarray:
    """Full attention probability maps in float32.

    Used for temporal self-attention guidance where the f x f probability
    block *is* the product (reference motionclone_functions.py:260-283,
    attention.py:564-611).  ``q``/``k``: (batch, seq, heads, head_dim);
    returns (batch, heads, seq_q, seq_k) float32.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    return jax.nn.softmax(logits * scale, axis=-1)
