"""Pallas flash attention vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from motionclone_tpu.ops.attention import _xla_attention
from motionclone_tpu.ops.flash_attention import flash_attention

B, S, H, D = 2, 1024, 2, 40  # SD1.5 spatial head dim 40, non-128-aligned


def _qkv(seed, s=S, d=D):
    rng = np.random.default_rng(seed)
    shape = (B, s, H, d)
    return tuple(
        jnp.asarray(rng.normal(size=shape), jnp.float32) for _ in range(3)
    )


def test_forward_matches_xla():
    q, k, v = _qkv(0)
    scale = D**-0.5
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=scale, block_q=256, block_k=256)
    ref = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_backward_matches_xla():
    q, k, v = _qkv(1, s=512)
    scale = D**-0.5

    def f_flash(q, k, v):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(
                flash_attention(q, k, v, scale=scale, block_q=256, block_k=256) ** 2
            )

    def f_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, scale) ** 2)

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(f_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4, rtol=1e-3,
            err_msg=f"d{name} mismatch",
        )


@pytest.mark.parametrize("d", [40, 80, 128])
def test_head_dims(d):
    q, k, v = _qkv(2, s=512, d=d)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale=d**-0.5, block_q=256, block_k=256)
    ref = _xla_attention(q, k, v, d**-0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)
