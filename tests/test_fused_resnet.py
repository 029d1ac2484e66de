"""Fused ResnetBlock3D kernel vs the unfused module (interpret on CPU).

The per-frame Pallas kernel (ops/fused_resnet.py) must reproduce
ResnetBlock3D exactly: same params, same math, one kernel per frame.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.models.resnet import ResnetBlock3D
from motionclone_tpu.ops.fused_resnet import supported

B, F, H, W, CIN, COUT = 1, 2, 8, 8, 32, 48
GROUPS = 8
TEMB_DIM = 24


def make_block(impl, cout=COUT):
    return ResnetBlock3D(
        out_channels=cout,
        groups=GROUPS,
        eps=1e-5,
        use_inflated_groupnorm=True,
        attention_impl=impl,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, CIN)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, TEMB_DIM)), jnp.float32)
    params = make_block("xla").init(jax.random.PRNGKey(0), x, temb)
    return x, temb, params


def test_supported_gate():
    assert supported((1, 16, 64, 64, 320), 320, 32)
    assert supported((1, 16, 64, 64, 640), 320, 32)   # up-block concat input
    assert supported((1, 16, 32, 32, 1920), 640, 32)
    assert not supported((1, 16, 16, 16, 2560), 1280, 32)  # weights over budget
    assert not supported((1, 16, 64, 64, 320), 320, 32, "scale_shift")


def test_fused_matches_unfused(data):
    x, temb, params = data
    ref = make_block("xla").apply(params, x, temb)
    out = make_block("fused").apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_identity_shortcut():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, COUT)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, TEMB_DIM)), jnp.float32)
    params = make_block("xla").init(jax.random.PRNGKey(0), x, temb)
    ref = make_block("xla").apply(params, x, temb)
    out = make_block("fused").apply(params, x, temb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_no_temb(data):
    x, temb, params0 = data
    params = make_block("xla").init(jax.random.PRNGKey(0), x, None)
    ref = make_block("xla").apply(params, x, None)
    out = make_block("fused").apply(params, x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_bf16(data):
    x, temb, params = data
    ref = ResnetBlock3D(
        out_channels=COUT, groups=GROUPS, use_inflated_groupnorm=True,
        attention_impl="xla", dtype=jnp.bfloat16,
    ).apply(params, x.astype(jnp.bfloat16), temb.astype(jnp.bfloat16))
    out = ResnetBlock3D(
        out_channels=COUT, groups=GROUPS, use_inflated_groupnorm=True,
        attention_impl="fused", dtype=jnp.bfloat16,
    ).apply(params, x.astype(jnp.bfloat16), temb.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=8e-2, rtol=8e-2)


def test_fused_init_equals_unfused_init(data):
    x, temb, params = data
    params_fused = make_block("fused").init(jax.random.PRNGKey(0), x, temb)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )
