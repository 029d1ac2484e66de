"""Production-shape coverage (VERDICT.md item 6).

Every other model test runs ``tiny_unet_config()``; production-shape
(320/640/1280-channel, 4096-seq) correctness was previously exercised only
implicitly via the TPU bench. Two layers of coverage here:

- fast guard tests: the fused-kernel dispatch predicates
  (``supported()``/``pick_tile``) must keep accepting the exact shapes the
  512x512x16f pipeline feeds them — a drifted guard silently falls back to
  the slow path with no test failing anywhere else;
- a slow-marked full forward of the real 320-1280 channel UNet at
  512**2/16f latents in ``xla`` impl on CPU, asserting finite outputs and
  the expected guidance-probs keys (run with ``--runslow`` / RUN_SLOW=1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.config import UNet3DConfig
from motionclone_tpu.ops import flash_attention as fa
from motionclone_tpu.ops import fused_block, fused_resnet, fused_temporal
from motionclone_tpu.ops import temporal_attention as ta

B, F = 1, 16
LAT = 64  # 512 / 8 VAE downscale

# (spatial side, channels) per UNet level at 512**2
LEVELS = [(64, 320), (32, 640), (16, 1280), (8, 1280)]


class TestFusedDispatchGuards:
    """Production shapes must stay on the fast (fused/Pallas) path."""

    def test_flash_attention_accepts_spatial_self_attn(self):
        # spatial self-attention: (b*f, s, c) with s = side**2
        for side, c in LEVELS:
            s = side * side
            assert fa.supported((B * F, s, c), (B * F, s, c), heads=8), (
                f"flash fwd/bwd must accept spatial attn at {side}x{side} C={c}"
            )

    def test_flash_attention_accepts_cross_attn(self):
        # cross-attention: kv length 77 (text tokens)
        for side, c in LEVELS:
            s = side * side
            assert fa.supported((B * F, s, c), (B * F, 77, c), heads=8)

    def test_fused_transformer_block_covers_320_and_640(self):
        # whole-module fusion is adopted at C<=640 (C=1280 measured and
        # rejected, PERF.md); these two levels carry most of the time
        assert fused_block.supported(64 * 64, 320, heads=8)
        assert fused_block.supported(32 * 32, 640, heads=8)

    def test_fused_temporal_covers_320_and_640(self):
        assert fused_temporal.supported(F, 64 * 64, 320, heads=8)
        assert fused_temporal.supported(F, 32 * 32, 640, heads=8)

    def test_temporal_attention_kernel_and_tiles(self):
        for side, _ in LEVELS:
            assert ta.supported(F, side * side)
        # frame sharding: tiny local frame counts must still find a tile
        for f_local in (1, 2, 4, 8):
            assert ta.pick_tile(f_local, 64 * 64) is not None

    def test_fused_resnet_covers_320_and_640(self):
        assert fused_resnet.supported((B, F, 64, 64, 320), 320, groups=32)
        assert fused_resnet.supported((B, F, 32, 32, 640), 640, groups=32)
        # the up-block skip-concat resnets double cin
        assert fused_resnet.supported((B, F, 64, 64, 640), 320, groups=32)


def _materialize_random_params(model, sample, ctx, scale=0.02, seed=0):
    """Random params with the real topology's shapes, without running init
    compute (eval_shape + host-side draws)."""
    params = jax.eval_shape(
        lambda r: model.init(r, sample, jnp.array([1]), ctx),
        jax.random.PRNGKey(0),
    )
    leaves, treedef = jax.tree_util.tree_flatten(
        params, is_leaf=lambda x: hasattr(x, "shape")
    )
    gen = np.random.default_rng(seed)
    leaves = [
        jnp.asarray(scale * gen.standard_normal(l.shape), l.dtype)
        for l in leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def test_production_channels_forward_finite_small_spatial():
    """Production CHANNEL topology (320/640/1280, 32 groups, 8 heads) at
    reduced spatial size — 128**2 pixels -> 16**2 latents — so the
    channel/group/head special-casing runs in every default suite
    (VERDICT r2 weak #6: the full-size smoke is slow-gated and would rot).
    Spatial size only changes attention sequence lengths; every channel
    count, GroupNorm grouping, head split, and block-wiring path is the
    full-size one."""
    from motionclone_tpu.models.unet3d import UNet3DConditionModel

    lat = 16  # 128 / 8 VAE downscale
    cfg = UNet3DConfig()  # defaults ARE the production topology
    model = UNet3DConditionModel(
        cfg=cfg, guidance_blocks=("up_blocks.1",), attention_impl="xla"
    )
    sample = jnp.zeros((B, F, lat, lat, 4), jnp.float32)
    ctx = jnp.zeros((B, 77, cfg.cross_attention_dim), jnp.float32)
    params = _materialize_random_params(model, sample, ctx)

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, F, lat, lat, 4)),
        jnp.float32,
    )
    c = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, 77, cfg.cross_attention_dim)),
        jnp.float32,
    )
    out, probs = model.apply(params, x, jnp.array([500]), c)
    assert out.shape == (B, F, lat, lat, 4)
    assert bool(jnp.isfinite(out).all())

    # up_blocks.1 runs at lat/4: 4x4 for the 4-level net at 16x16 latents
    assert len(probs) == 6
    for key, p in probs.items():
        assert key.startswith("up_blocks.1.motion_modules.")
        assert p.shape == (B, 4 * 4, 8, F, F)
        np.testing.assert_allclose(
            np.asarray(p.sum(-1), np.float32), 1.0, rtol=2e-3
        )


@pytest.mark.slow
def test_production_unet_forward_finite():
    """One real-topology forward at 512**2/16f (xla impl, CPU, bf16 params
    like the TPU pipeline; minutes of CPU time)."""
    from motionclone_tpu.models.unet3d import UNet3DConditionModel

    cfg = UNet3DConfig()  # defaults ARE the production topology
    model = UNet3DConditionModel(
        cfg=cfg, guidance_blocks=("up_blocks.1",), attention_impl="xla"
    )
    sample = jnp.zeros((B, F, LAT, LAT, 4), jnp.float32)
    ctx = jnp.zeros((B, 77, cfg.cross_attention_dim), jnp.float32)
    params = _materialize_random_params(model, sample, ctx)

    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, F, LAT, LAT, 4)),
        jnp.float32,
    )
    c = jnp.asarray(
        np.random.default_rng(2).normal(size=(B, 77, cfg.cross_attention_dim)),
        jnp.float32,
    )
    out, probs = model.apply(params, x, jnp.array([500]), c)
    assert out.shape == (B, F, LAT, LAT, 4)
    assert bool(jnp.isfinite(out).all())

    # up_blocks.1: (layers_per_block + 1) = 3 motion modules x 2 attn blocks
    assert len(probs) == 6
    for key, p in probs.items():
        assert key.startswith("up_blocks.1.motion_modules.")
        # up_blocks.1 runs at 16x16 for the 4-level net at 64x64 latents
        assert p.shape == (B, 16 * 16, 8, F, F)
        np.testing.assert_allclose(
            np.asarray(p.sum(-1), np.float32), 1.0, rtol=2e-3
        )
