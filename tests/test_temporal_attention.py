"""Fused temporal-attention kernel vs a straightforward reference.

The kernel packs TS pixels x F frames into one masked MXU tile
(ops/temporal_attention.py); correctness target is per-pixel softmax
attention identical to the reference's rearranged formulation
(reference motion_module.py:279)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.ops.temporal_attention import (
    supported,
    temporal_attention,
)


def reference_attention(q, k, v, heads, scale):
    """(B, F, S, H*D) per-pixel per-head attention, dense formulation."""
    b, f, s, hd = q.shape
    d = hd // heads
    qs = q.reshape(b, f, s, heads, d)
    ks = k.reshape(b, f, s, heads, d)
    vs = v.reshape(b, f, s, heads, d)
    logits = jnp.einsum("bfshd,bgshd->bshfg", qs, ks).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bshfg,bgshd->bfshd", p.astype(vs.dtype), vs)
    return out.reshape(b, f, s, hd)


def make_qkv(rng, b=1, f=16, s=32, heads=2, d=8, dtype=jnp.float32):
    shape = (b, f, s, heads * d)
    mk = lambda: jnp.asarray(rng.normal(size=shape), jnp.float32).astype(dtype)
    return mk(), mk(), mk()


def test_supported_gate():
    assert supported(16, 4096)
    assert supported(16, 64)
    assert not supported(16, 65)   # spatial extent not tileable
    assert not supported(4, 16)    # packed tile below one MXU pass


def test_forward_matches_reference():
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng)
    scale = 8**-0.5
    out = temporal_attention(q, k, v, heads=2, scale=scale)
    ref = reference_attention(q, k, v, heads=2, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_forward_bf16():
    rng = np.random.default_rng(1)
    q, k, v = make_qkv(rng, dtype=jnp.bfloat16)
    scale = 8**-0.5
    out = temporal_attention(q, k, v, heads=2, scale=scale)
    ref = reference_attention(q, k, v, heads=2, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_multibatch_multihead():
    rng = np.random.default_rng(2)
    q, k, v = make_qkv(rng, b=2, f=16, s=48, heads=4, d=4)
    scale = 4**-0.5
    out = temporal_attention(q, k, v, heads=4, scale=scale)
    ref = reference_attention(q, k, v, heads=4, scale=scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_reference():
    rng = np.random.default_rng(3)
    q, k, v = make_qkv(rng, s=32)
    scale = 8**-0.5
    tgt = jnp.asarray(rng.normal(size=q.shape), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.mean((temporal_attention(q, k, v, heads=2, scale=scale) - tgt) ** 2)

    def loss_ref(q, k, v):
        return jnp.mean((reference_attention(q, k, v, heads=2, scale=scale) - tgt) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gk, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_rejects_bad_shapes():
    rng = np.random.default_rng(4)
    q, k, v = make_qkv(rng, s=30)  # 30 % 16 != 0
    with pytest.raises(ValueError):
        temporal_attention(q, k, v, heads=2, scale=1.0)


def reference_attention_rect(q, k, v, heads, scale):
    """Rectangular per-pixel attention: q (B,Fq,S,HD), k/v (B,Fk,S,HD)."""
    b, fq, s, hd = q.shape
    fk = k.shape[1]
    d = hd // heads
    qs = q.reshape(b, fq, s, heads, d)
    ks = k.reshape(b, fk, s, heads, d)
    vs = v.reshape(b, fk, s, heads, d)
    logits = jnp.einsum("bfshd,bgshd->bshfg", qs, ks).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bshfg,bgshd->bfshd", p.astype(vs.dtype), vs)
    return out.reshape(b, fq, s, hd)


def test_rectangular_forward_matches_reference():
    """q holds the local frame shard, k/v the gathered global frames — the
    frame-sharded (shard_map) form of the kernel."""
    rng = np.random.default_rng(0)
    fq, fk, s, heads, d = 4, 16, 64, 2, 8
    q = jnp.asarray(rng.normal(size=(1, fq, s, heads * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, fk, s, heads * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, fk, s, heads * d)), jnp.float32)
    scale = d**-0.5
    out = temporal_attention(q, k, v, heads=heads, scale=scale, ts=32)
    ref = reference_attention_rect(q, k, v, heads, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_rectangular_gradients_match_reference():
    rng = np.random.default_rng(1)
    fq, fk, s, heads, d = 2, 8, 64, 2, 8
    q = jnp.asarray(rng.normal(size=(1, fq, s, heads * d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, fk, s, heads * d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, fk, s, heads * d)), jnp.float32)
    scale = d**-0.5
    w = jnp.asarray(rng.normal(size=(1, fq, s, heads * d)), jnp.float32)

    def loss_kernel(q, k, v):
        return jnp.sum(
            w * temporal_attention(q, k, v, heads=heads, scale=scale, ts=64)
        )

    def loss_ref(q, k, v):
        return jnp.sum(w * reference_attention_rect(q, k, v, heads, scale))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)


def test_pick_tile():
    from motionclone_tpu.ops.temporal_attention import pick_tile

    assert pick_tile(16, 4096) == 16          # full frames: default tile
    assert pick_tile(2, 4096) == 64           # 2 local frames need ts=64
    assert pick_tile(1, 4096) == 128
    assert pick_tile(2, 16) is None           # s too small to widen
