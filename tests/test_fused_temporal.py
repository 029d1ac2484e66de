"""Fused whole-motion-module kernel vs the unfused module (interpret on CPU).

The Pallas kernel (ops/fused_temporal.py) must reproduce
TemporalTransformer3D exactly: same params, same math, one kernel after the
GroupNorm statistics.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.config import MotionModuleConfig
from motionclone_tpu.models.motion_module import VanillaTemporalModule
from motionclone_tpu.ops.fused_temporal import supported

B, F, H, W, C = 1, 8, 8, 8, 32
HEADS = 4

CFG = MotionModuleConfig(
    num_attention_heads=HEADS,
    num_transformer_block=1,
    attention_block_types=("Temporal_Self", "Temporal_Self"),
    temporal_position_encoding=True,
    temporal_position_encoding_max_len=24,
    norm_num_groups=8,
)


def make_module(impl, cfg=CFG):
    return VanillaTemporalModule(cfg=cfg, attention_impl=impl, dtype=jnp.float32)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, C)), jnp.float32)
    params = make_module("xla").init(jax.random.PRNGKey(0), x)
    return x, params


def test_supported_gate():
    assert supported(16, 4096, 320, 8)
    assert supported(16, 1024, 640, 8)
    assert not supported(16, 256, 1280, 8)   # channels above weight budget
    assert not supported(16, 4095, 320, 8)   # uneven spatial tiling
    assert not supported(4, 4096, 320, 8)    # packed rows below one MXU pass


def test_fused_matches_unfused(data):
    x, params = data
    ref, _ = make_module("xla").apply(params, x)
    out, _ = make_module("fused").apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_single_attention_block(data):
    """SparseCtrl motion modules have one Temporal_Self block."""
    cfg = dataclasses.replace(CFG, attention_block_types=("Temporal_Self",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, C)), jnp.float32)
    params = make_module("xla", cfg).init(jax.random.PRNGKey(0), x)
    ref, _ = make_module("xla", cfg).apply(params, x)
    out, _ = make_module("fused", cfg).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_no_pos_encoding(data):
    cfg = dataclasses.replace(CFG, temporal_position_encoding=False)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, F, H, W, C)), jnp.float32)
    params = make_module("xla", cfg).init(jax.random.PRNGKey(0), x)
    ref, _ = make_module("xla", cfg).apply(params, x)
    out, _ = make_module("fused", cfg).apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_returns_probs_via_unfused(data):
    """return_probs must fall back to the unfused path (probs required)."""
    x, params = data
    out, probs = make_module("fused").apply(params, x, return_probs=True)
    ref, ref_probs = make_module("xla").apply(params, x, return_probs=True)
    assert len(probs) == 2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
    for p, q in zip(probs, ref_probs):
        np.testing.assert_allclose(np.asarray(p), np.asarray(q),
                                   atol=3e-5, rtol=1e-4)


def test_fused_init_equals_unfused_init(data):
    x, params = data
    params_fused = make_module("fused").init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )


def test_fused_bf16(data):
    x, params = data
    ref, _ = VanillaTemporalModule(
        cfg=CFG, attention_impl="xla", dtype=jnp.bfloat16
    ).apply(params, x.astype(jnp.bfloat16))
    out, _ = VanillaTemporalModule(
        cfg=CFG, attention_impl="fused", dtype=jnp.bfloat16
    ).apply(params, x.astype(jnp.bfloat16))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=8e-2, rtol=8e-2)
