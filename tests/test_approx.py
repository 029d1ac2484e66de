"""Opt-in --approx uncond-cache mode (cross-step uncond caching).

Correctness anchors on CPU:
- at ``cfg_scale == 0`` the uncond prediction cancels out of the CFG
  formula ``cond + s*(cond - uncond)``, so the approx pipeline must equal
  the exact one BIT-FOR-BIT for any interval — this pins the whole approx
  plumbing (carry threading, refresh flags, cond branches) against the
  exact path;
- at real cfg_scale the approx output must stay finite and close to exact
  (staleness is a small perturbation at these step counts);
- the CLI spec parser and the composition guards reject invalid setups.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.config import (
    InferenceConfig,
    NoiseScheduleConfig,
    tiny_unet_config,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.pipeline.motionclone import make_sampling_fns

B, F, H, W = 1, 4, 8, 8


def _setup(seed, **knobs):
    unet_cfg = tiny_unet_config()
    sched_cfg = NoiseScheduleConfig()
    defaults = dict(
        inference_steps=6,
        guidance_steps=3,
        guidance_fraction=0.3,
        warm_up_steps=1,
        cool_up_steps=1,
        motion_guidance_weight=50.0,
        motion_guidance_blocks=("up_blocks.1",),
        width=W * 8,
        height=H * 8,
        video_length=F,
    )
    defaults.update(knobs)
    infer_cfg = InferenceConfig(**defaults)
    model = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, F, H, W, 4)),
        jnp.array([1]),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
    )
    rng = np.random.default_rng(seed)
    latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    uncond = jnp.asarray(
        rng.normal(size=(B, 77, unet_cfg.cross_attention_dim)), jnp.float32
    )
    cond = jnp.asarray(
        rng.normal(size=(B, 77, unet_cfg.cross_attention_dim)), jnp.float32
    )
    s_hw = (H // 4) * (W // 4)
    heads = unet_cfg.motion_module.num_attention_heads
    rep = {}
    for m in range(2):
        for a in range(2):
            name = (
                f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                f".transformer_blocks.0.attention_blocks.{a}"
            )
            rep[name] = (
                jnp.asarray(
                    rng.uniform(0.2, 0.9, size=(B, s_hw, heads, F, 1)),
                    jnp.float32,
                ),
                jnp.asarray(
                    rng.integers(0, F, size=(B, s_hw, heads, F, 1)), np.uint8
                ),
            )
    return unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep


def test_approx_exact_at_zero_cfg_scale():
    """cfg_scale=0 removes the uncond term entirely -> the approx pipeline
    computes the same math as the exact one for any interval (equal up to
    XLA reassociation between the two separately compiled graphs)."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(0, cfg_scale=0.0)
    )
    exact = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32
    )
    approx = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=3
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(approx.sample(params, latents, uncond, cond, rep, None, None))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_approx_close_at_real_cfg_scale():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(1, cfg_scale=7.5)
    )
    exact = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32
    )
    approx = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=2
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(approx.sample(params, latents, uncond, cond, rep, None, None))
    assert np.isfinite(out).all()
    assert out.shape == ref.shape
    # staleness perturbs, it must not explode (random tiny weights + cfg 7.5
    # amplify differences far beyond what trained weights see — this bounds
    # blow-up, not quality; quality is a real-weights question)
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1.5, rel
    # and the refresh interval genuinely changes the output (it IS approx)
    assert np.abs(out - ref).max() > 0


def test_approx_interval_one_is_exact_path():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(2)
    )
    a = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    b = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=1
    )
    ra = np.asarray(a.sample(params, latents, uncond, cond, rep, None, None))
    rb = np.asarray(b.sample(params, latents, uncond, cond, rep, None, None))
    np.testing.assert_array_equal(ra, rb)


def test_approx_guards():
    from motionclone_tpu.parallel.mesh import (
        cfg_pair_sharding,
        make_mesh_2d,
        make_mesh_video,
    )

    unet_cfg, sched_cfg, infer_cfg, *_ = _setup(0)
    with pytest.raises(ValueError, match="uncond_interval"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, uncond_interval=0
        )
    mesh = make_mesh_2d(data=4, cfg=2)
    with pytest.raises(ValueError, match="CFG-pair"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, uncond_interval=2,
            cfg_pair_sharding=cfg_pair_sharding(mesh),
        )
    with pytest.raises(ValueError, match="CFG-pair"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, uncond_interval=2,
            frame_shard_map=make_mesh_video(frames=4, cfg=2),
        )


def test_parse_approx_cli_spec():
    from motionclone_tpu.cli import parse_approx

    assert parse_approx("") == 1
    assert parse_approx("uncond-cache") == 3
    assert parse_approx("uncond-cache:2") == 2
    with pytest.raises(SystemExit):
        parse_approx("magic")
    with pytest.raises(SystemExit):
        parse_approx("uncond-cache:1")
