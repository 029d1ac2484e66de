"""End-to-end pipeline test on a tiny config (latent-space API, CPU)."""

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
from motionclone_tpu.pipeline.motionclone import (
    MotionClonePipeline,
    guidance_cut_index,
)

B, F, H, W = 1, 4, 16, 16


def make_infer_cfg(**kw):
    base = dict(
        inference_steps=6,
        guidance_steps=4,
        guidance_fraction=0.3,
        warm_up_steps=2,
        cool_up_steps=2,
        motion_guidance_weight=100.0,
        motion_guidance_blocks=("up_blocks.1",),
        add_noise_step=400,
        width=W * 8,
        height=H * 8,
        video_length=F,
        cfg_scale=7.5,
    )
    base.update(kw)
    return InferenceConfig(**base)


@pytest.fixture(scope="module")
def pipeline():
    unet_cfg = tiny_unet_config()
    infer_cfg = make_infer_cfg()
    sched_cfg = NoiseScheduleConfig()
    model = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 77, unet_cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    return MotionClonePipeline(
        unet_cfg, sched_cfg, infer_cfg, params, dtype=jnp.float32
    )


def _embs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    uncond = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim)), jnp.float32)
    return uncond, cond


def test_guidance_cut_index():
    assert guidance_cut_index(("up_blocks.1",)) == 1
    assert guidance_cut_index(("up_blocks.0", "up_blocks.2")) == 2


def test_extract_and_sample_end_to_end(pipeline):
    unet_cfg = pipeline.unet_cfg
    rng = np.random.default_rng(0)
    video_latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    uncond, cond = _embs(unet_cfg)

    rep = pipeline.extract_motion_representation(video_latents, uncond, seed=42)
    # up_blocks.1: 2 motion modules x 2 attention blocks
    assert len(rep) == 4
    for name, (values, indices) in rep.items():
        assert values.dtype == np.float32 and indices.dtype == np.uint8
        assert values.shape == indices.shape
        assert values.shape[-2:] == (F, 1)
        assert (values > 0).all() and (values <= 1.0 + 1e-6).all()
        assert (indices < F).all()

    out = pipeline.sample_latents(uncond, cond, rep, seed=7)
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()

    # determinism: same seeds -> identical output
    out2 = pipeline.sample_latents(uncond, cond, rep, seed=7)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))

    # different seed -> different output
    out3 = pipeline.sample_latents(uncond, cond, rep, seed=8)
    assert np.abs(np.asarray(out) - np.asarray(out3)).max() > 1e-4


def test_guidance_actually_steers(pipeline):
    """Sampling with motion guidance must differ from weight=0 sampling."""
    unet_cfg = pipeline.unet_cfg
    rng = np.random.default_rng(3)
    video_latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    uncond, cond = _embs(unet_cfg, seed=1)
    rep = pipeline.extract_motion_representation(video_latents, uncond, seed=42)
    out_guided = pipeline.sample_latents(uncond, cond, rep, seed=7)

    from motionclone_tpu.pipeline.motionclone import MotionClonePipeline

    pipe0 = MotionClonePipeline(
        pipeline.unet_cfg,
        pipeline.sched_cfg,
        make_infer_cfg(motion_guidance_weight=0.0),
        pipeline.params,
        dtype=jnp.float32,
    )
    out_plain = pipe0.sample_latents(uncond, cond, rep, seed=7)
    assert np.abs(np.asarray(out_guided) - np.asarray(out_plain)).max() > 1e-5


def test_sample_plain_vanilla_path(pipeline):
    """Plain AnimateDiff generation (legacy __call__ parity,
    pipeline_animation.py:326-497): no motion rep, leading DDIM spacing."""
    uncond, cond = _embs(pipeline.unet_cfg, seed=2)
    out = pipeline.sample_latents_plain(uncond, cond, seed=11)
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()
    # deterministic in the seed
    out2 = pipeline.sample_latents_plain(uncond, cond, seed=11)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # plain path uses the full-range leading schedule, not the uneven one
    from motionclone_tpu.diffusion.ddim import build_timesteps

    ts = build_timesteps(
        pipeline.infer_cfg.inference_steps,
        pipeline.sched_cfg.num_train_timesteps,
        steps_offset=pipeline.sched_cfg.steps_offset,
        spacing="leading",
    )
    assert ts[0] != pipeline.fns.timesteps[0] or len(ts) == len(
        pipeline.fns.timesteps
    )


def test_sample_resume_checkpoint(pipeline, tmp_path):
    """Interrupted guided sampling resumes bit-exactly from the per-chunk
    checkpoint (additive over the reference, SURVEY §5)."""
    import os

    unet_cfg = pipeline.unet_cfg
    rng = np.random.default_rng(5)
    uncond, cond = _embs(unet_cfg, seed=5)
    video_latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    rep = pipeline.extract_motion_representation(video_latents, uncond, seed=42)
    latents0 = jax.random.normal(jax.random.PRNGKey(9), (B, F, H, W, 4))
    args = (pipeline.params, latents0, uncond, cond, rep, None, None)

    ref = pipeline.fns.sample(*args, chunk_steps=2)

    path = str(tmp_path / "resume.npz")

    class Stop(Exception):
        pass

    def boom(done, total):
        assert total == pipeline.infer_cfg.inference_steps
        if done >= 2:
            raise Stop

    with pytest.raises(Stop):
        pipeline.fns.sample(*args, chunk_steps=2, resume_path=path, on_chunk=boom)
    assert os.path.exists(path)

    out = pipeline.fns.sample(*args, chunk_steps=2, resume_path=path)
    assert not os.path.exists(path)  # cleaned up on completion
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # a checkpoint from a different chunking is ignored, not misapplied
    with pytest.raises(Stop):
        pipeline.fns.sample(*args, chunk_steps=2, resume_path=path, on_chunk=boom)
    out2 = pipeline.fns.sample(*args, chunk_steps=3, resume_path=path)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(ref))


def test_sample_plain_save_probs(pipeline, tmp_path):
    """save_probs debug dump parity (pipeline_animation.py:461-465,483-485):
    per-step temporal-attention prob maps written as an .npz, and the dump
    does not perturb the sampled latents."""
    uncond, cond = _embs(pipeline.unet_cfg, seed=4)
    path = str(tmp_path / "probs.npz")
    out = pipeline.sample_latents_plain(
        uncond, cond, seed=13, save_probs_path=path
    )
    ref = pipeline.sample_latents_plain(uncond, cond, seed=13)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    data = np.load(path)
    # up_blocks.1: 2 motion modules x 2 attention blocks
    assert len(data.files) == 4
    steps = pipeline.infer_cfg.inference_steps
    for k in data.files:
        probs = data[k]
        assert probs.shape[0] == steps
        assert probs.shape[-2:] == (F, F)
        # valid attention rows from the batched CFG forward (batch 2)
        np.testing.assert_allclose(
            probs.sum(axis=-1), np.ones(probs.shape[:-1]), atol=1e-3
        )


def test_non_square_resolution_end_to_end():
    """Full extract + guided sample at H != W (64x128 pixels -> 8x16
    latents).  Square shapes hide H/W transpositions in the pixel-major
    rearranges (spatial attention, temporal (B,F,S,C) packing, upsampling);
    non-square either crashes or flows through correctly."""
    unet_cfg = tiny_unet_config()
    h, w = 8, 16
    infer_cfg = make_infer_cfg(width=w * 8, height=h * 8, inference_steps=4,
                               guidance_steps=2, warm_up_steps=1,
                               cool_up_steps=1)
    model = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    sample = jnp.zeros((B, F, h, w, 4))
    ctx = jnp.zeros((B, 77, unet_cfg.cross_attention_dim))
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    pipe = MotionClonePipeline(
        unet_cfg, NoiseScheduleConfig(), infer_cfg, params, dtype=jnp.float32
    )

    rng = np.random.default_rng(3)
    video_latents = jnp.asarray(rng.normal(size=(B, F, h, w, 4)), jnp.float32)
    uncond, cond = _embs(unet_cfg, seed=9)
    rep = pipe.extract_motion_representation(video_latents, uncond, seed=42)
    for name, (values, indices) in rep.items():
        # tiny config: up_blocks.1 sits at 4x spatial downsample
        assert values.shape[1] == (h // 4) * (w // 4)
    out = pipe.sample_latents(uncond, cond, rep, seed=7)
    assert out.shape == (B, F, h, w, 4)
    assert np.isfinite(np.asarray(out)).all()
