"""Pallas flash attention vs the XLA reference path (interpret mode on CPU).

The kernel consumes natural-layout (B, S, heads*D) tensors (see
ops/flash_attention.py); the oracle is the einsum formulation over
(B, S, H, D)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.ops.attention import _xla_attention
from motionclone_tpu.ops.flash_attention import flash_attention, supported

B, S, H, D = 2, 1024, 2, 40  # SD1.5 spatial head dim 40, non-128-aligned


def _qkv(seed, s=S, d=D, h=H):
    rng = np.random.default_rng(seed)
    shape = (B, s, h, d)
    return tuple(
        jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3)
    )


def _flash(q, k, v, scale, block_q=256):
    b, s, h, d = q.shape
    sk = k.shape[1]
    out = flash_attention(
        q.reshape(b, s, h * d), k.reshape(b, sk, h * d),
        v.reshape(b, sk, h * d), scale=scale, heads=h, block_q=block_q,
    )
    return out.reshape(b, s, h, d)


def test_supported_gate():
    assert supported((1, 4096, 320), (1, 4096, 320), 8)
    assert supported((1, 1024, 640), (1, 1024, 640), 8)
    assert supported((1, 16384, 320), (1, 16384, 320), 8)    # streaming: any S
    assert supported((1, 4000, 320), (1, 4000, 320), 8)   # whole-KV: any S
    assert supported((1, 2304, 320), (1, 2304, 320), 8)   # 384x384 videos
    assert not supported((1, 4096, 321), (1, 4096, 321), 8)  # heads mismatch
    # streaming paths still require even tiles (sk > fwd block_k 4096,
    # sk*hd > the whole-bwd VMEM bound)
    assert not supported((1, 20000, 320), (1, 20000, 320), 8)


def test_forward_matches_xla():
    q, k, v = _qkv(0)
    scale = D**-0.5
    out = _flash(q, k, v, scale)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla():
    q, k, v = _qkv(1, s=512)
    scale = D**-0.5

    def f_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, scale) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("d,h", [(40, 8), (80, 4), (128, 2)])
def test_head_dims(d, h):
    q, k, v = _qkv(2, s=512, d=d, h=h)
    out = _flash(q, k, v, d**-0.5)
    ref = _xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_rejects_uneven_tiling():
    # the *streaming* paths require the sequence to tile evenly; force
    # streaming with a small block_k (sk > block_k) and an uneven block_q
    q, k, v = _qkv(3, s=768)
    b, s, h, d = q.shape
    with pytest.raises(ValueError):
        flash_attention(
            q.reshape(b, s, h * d), k.reshape(b, s, h * d),
            v.reshape(b, s, h * d), scale=1.0, heads=h,
            block_q=512, block_k=256,
        )


def test_multiple_kv_blocks_online_softmax():
    # sk = 1024 with block_k 256 -> 4 streamed kv blocks
    q, k, v = _qkv(4, s=1024)
    out = _flash(q, k, v, D**-0.5, block_q=256)
    ref = _xla_attention(q, k, v, D**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_whole_kv_partial_tile_halving():
    """Whole-KV path with S not divisible by the default 512 query tile.

    Regression for the partial-final-tile bug: undefined padded q/do/lse
    rows leaked into the shared dk/dv accumulators (e.g. 384x384 videos,
    S=2304 = 4.5 x 512; the tile must halve to 256).  Checks fwd AND bwd
    against XLA."""
    s = 2304
    rng = np.random.default_rng(5)
    shape = (1, s, H, D)
    q, k, v = (
        jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3)
    )
    scale = D**-0.5
    out = _flash(q, k, v, scale)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def f_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, scale) ** 2)

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-3, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )
