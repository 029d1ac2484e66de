"""Fused transformer-block kernel vs the unfused module (interpret on CPU).

The whole-block Pallas kernel (ops/fused_block.py) must reproduce
BasicTransformerBlock exactly: same params, same math, one kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.models.attention import BasicTransformerBlock
from motionclone_tpu.ops.fused_block import supported

BF, S, C, HEADS = 2, 128, 32, 4
T, CTX_DIM = 7, 24


def make_block(impl):
    return BasicTransformerBlock(
        dim=C,
        heads=HEADS,
        dim_head=C // HEADS,
        cross_attention_dim=CTX_DIM,
        attention_impl=impl,
        dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BF, S, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(BF, T, CTX_DIM)), jnp.float32)
    params = make_block("xla").init(jax.random.PRNGKey(0), x, ctx)
    return x, ctx, params


def test_supported_gate():
    assert supported(4096, 320, 8)
    assert supported(1024, 640, 8)
    assert not supported(4096, 1280, 8)  # channels above the VMEM budget
    assert not supported(4095, 320, 8)   # uneven query tiling


def test_fused_matches_unfused(data):
    x, ctx, params = data
    ref = make_block("xla").apply(params, x, ctx)
    out = make_block("fused").apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_matches_unfused_bf16(data):
    x, ctx, params = data
    block_ref = BasicTransformerBlock(
        dim=C, heads=HEADS, dim_head=C // HEADS,
        cross_attention_dim=CTX_DIM, attention_impl="xla", dtype=jnp.bfloat16,
    )
    block_fused = BasicTransformerBlock(
        dim=C, heads=HEADS, dim_head=C // HEADS,
        cross_attention_dim=CTX_DIM, attention_impl="fused", dtype=jnp.bfloat16,
    )
    xb = x.astype(jnp.bfloat16)
    cb = ctx.astype(jnp.bfloat16)
    ref = block_ref.apply(params, xb, cb).astype(np.float32)
    out = block_fused.apply(params, xb, cb).astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-2, rtol=5e-2)


def test_fused_init_equals_unfused_init(data):
    """init with fused impl creates the identical parameter tree."""
    x, ctx, params = data
    params_fused = make_block("fused").init(jax.random.PRNGKey(0), x, ctx)
    ref_paths = jax.tree_util.tree_structure(params)
    fused_paths = jax.tree_util.tree_structure(params_fused)
    assert ref_paths == fused_paths


def test_fused_multiple_query_tiles(data):
    """S larger than block_q exercises the K/V scratch reuse across tiles."""
    rng = np.random.default_rng(1)
    s = 1536  # 3 tiles at block_q=512
    x = jnp.asarray(rng.normal(size=(1, s, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, T, CTX_DIM)), jnp.float32)
    params = make_block("xla").init(jax.random.PRNGKey(0), x, ctx)
    ref = make_block("xla").apply(params, x, ctx)
    out = make_block("fused").apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_whole_transformer():
    """fused Transformer3DModel (GN+proj_in+block+proj_out+residual) matches
    the unfused module."""
    from motionclone_tpu.models.attention import Transformer3DModel

    rng = np.random.default_rng(3)
    b, f, hh, ww = 1, 2, 8, 16  # S = 128 = one query tile
    x = jnp.asarray(rng.normal(size=(b, f, hh, ww, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, T, CTX_DIM)), jnp.float32)

    def make(impl):
        return Transformer3DModel(
            heads=HEADS, dim_head=C // HEADS, num_layers=1,
            cross_attention_dim=CTX_DIM, norm_num_groups=8,
            attention_impl=impl, dtype=jnp.float32,
        )

    params = make("xla").init(jax.random.PRNGKey(0), x, ctx)
    ref = make("xla").apply(params, x, ctx)
    out = make("fused").apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_fused_whole_transformer_multi_tile():
    from motionclone_tpu.models.attention import Transformer3DModel

    rng = np.random.default_rng(4)
    b, f, hh, ww = 1, 1, 32, 32  # S = 1024 = two query tiles
    x = jnp.asarray(rng.normal(size=(b, f, hh, ww, C)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, T, CTX_DIM)), jnp.float32)

    def make(impl):
        return Transformer3DModel(
            heads=HEADS, dim_head=C // HEADS, num_layers=1,
            cross_attention_dim=CTX_DIM, norm_num_groups=8,
            attention_impl=impl, dtype=jnp.float32,
        )

    params = make("xla").init(jax.random.PRNGKey(0), x, ctx)
    ref = make("xla").apply(params, x, ctx)
    out = make("fused").apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)


def test_clipped_softmax_edges():
    """Self-attention logit clipping: exact within +-75, finite (flattened,
    never NaN) beyond, and cross-attention stays exact at any magnitude."""
    from motionclone_tpu.models.attention import Transformer3DModel

    rng = np.random.default_rng(5)
    b, f, hh, ww = 1, 1, 8, 16
    # scale activations hard to push self-attention logits to huge values
    x = jnp.asarray(rng.normal(size=(b, f, hh, ww, C)) * 50.0, jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, T, CTX_DIM)) * 50.0, jnp.float32)

    def make(impl):
        return Transformer3DModel(
            heads=HEADS, dim_head=C // HEADS, num_layers=1,
            cross_attention_dim=CTX_DIM, norm_num_groups=8,
            attention_impl=impl, dtype=jnp.float32,
        )

    params = make("xla").init(jax.random.PRNGKey(0), x, ctx)
    out = make("fused").apply(params, x, ctx)
    assert bool(jnp.all(jnp.isfinite(out))), "clipped softmax must not NaN"

    # moderate inputs (LN keeps logits far below the clip): exact match
    x2 = jnp.asarray(rng.normal(size=(b, f, hh, ww, C)), jnp.float32)
    ctx2 = jnp.asarray(rng.normal(size=(b, T, CTX_DIM)), jnp.float32)
    ref = make("xla").apply(params, x2, ctx2)
    got = make("fused").apply(params, x2, ctx2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-5, rtol=1e-4)
