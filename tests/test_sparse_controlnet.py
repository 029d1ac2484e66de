"""SparseControlNet structural tests + i2v pipeline integration (tiny)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.config import (
    InferenceConfig,
    MotionModuleConfig,
    NoiseScheduleConfig,
    tiny_unet_config,
)
from motionclone_tpu.models.sparse_controlnet import (
    SparseControlNetConfig,
    SparseControlNetModel,
    scatter_condition,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.pipeline.motionclone import (
    MotionClonePipeline,
    make_controlnet_apply,
)

B, F, H, W = 1, 4, 16, 16


def tiny_cn_config(simplified=True):
    unet_cfg = tiny_unet_config()
    return SparseControlNetConfig(
        conditioning_channels=4 if simplified else 3,
        use_simplified_condition_embedding=simplified,
        set_noisy_sample_input_to_zero=True,
        conditioning_embedding_out_channels=(4, 8),
        block_out_channels=unet_cfg.block_out_channels,
        layers_per_block=unet_cfg.layers_per_block,
        norm_num_groups=unet_cfg.norm_num_groups,
        cross_attention_dim=unet_cfg.cross_attention_dim,
        num_heads=unet_cfg.attention_head_dim,
        motion_module=MotionModuleConfig(
            num_attention_heads=2,
            attention_block_types=("Temporal_Self",),
            temporal_position_encoding_max_len=32,
            norm_num_groups=4,
        ),
    )


def _init(cfg, cond_hw, cond_c):
    model = SparseControlNetModel(cfg=cfg)
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((1, 77, cfg.cross_attention_dim))
    cond = jnp.zeros((B, F, cond_hw, cond_hw, cond_c))
    mask = jnp.zeros((B, F, cond_hw, cond_hw, 1))
    params = model.init(
        jax.random.PRNGKey(0), sample, jnp.array([1]), ctx, cond, mask
    )
    return model, params


def test_simplified_latent_conditioning_shapes():
    cfg = tiny_cn_config(simplified=True)
    model, params = _init(cfg, H, 4)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    mask = jnp.ones((B, F, H, W, 1), jnp.float32)
    down, mid = model.apply(params, sample, jnp.array([400]), ctx, cond, mask)
    # 1 conv_in + layers_per_block(1)*4 blocks + 3 downsamplers = 8 heads
    assert len(down) == 8
    # residual spatial dims follow the UNet skip pyramid
    assert down[0].shape == (B, F, H, W, cfg.block_out_channels[0])
    assert mid.shape[-1] == cfg.block_out_channels[-1]
    # zero-initialized output heads -> all residuals are exactly zero at init
    for d in down:
        assert np.all(np.asarray(d) == 0)
    assert np.all(np.asarray(mid) == 0)


def test_pixel_conditioning_downsamples():
    cfg = tiny_cn_config(simplified=False)
    # pixel-space condition at 2x latent res with a 2-block embedding stack
    model, params = _init(cfg, H * 2, 3)
    rng = np.random.default_rng(1)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, F, H * 2, W * 2, 3)), jnp.float32)
    mask = jnp.ones((B, F, H * 2, W * 2, 1), jnp.float32)
    down, mid = model.apply(params, sample, jnp.array([400]), ctx, cond, mask)
    assert down[0].shape == (B, F, H, W, cfg.block_out_channels[0])


def test_set_noisy_sample_input_to_zero_ignores_latents():
    """With the flag, output must not depend on the latent sample
    (sparse_controlnet.py:516-518)."""
    cfg = tiny_cn_config(simplified=True)
    model, params = _init(cfg, H, 4)
    # perturb the zero-init heads so outputs are nonzero
    params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.default_rng(0).normal(size=x.shape).astype(
            np.float32
        ),
        params,
    )
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.normal(size=(1, 77, cfg.cross_attention_dim)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    mask = jnp.ones((B, F, H, W, 1), jnp.float32)
    s1 = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    s2 = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    out1 = model.apply(params, s1, jnp.array([400]), ctx, cond, mask)
    out2 = model.apply(params, s2, jnp.array([400]), ctx, cond, mask)
    for a, b in zip(out1[0], out2[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))


def test_scatter_condition():
    frames = jnp.ones((1, 2, 4, 4, 3))
    cond, mask = scatter_condition(frames, (0, 3), video_length=5)
    assert cond.shape == (1, 5, 4, 4, 3)
    assert mask.shape == (1, 5, 4, 4, 1)
    np.testing.assert_array_equal(np.asarray(cond[:, [0, 3]]), 1.0)
    np.testing.assert_array_equal(np.asarray(cond[:, [1, 2, 4]]), 0.0)
    np.testing.assert_array_equal(np.asarray(mask[:, [0, 3]]), 1.0)
    np.testing.assert_array_equal(np.asarray(mask[:, [1, 2, 4]]), 0.0)


def test_i2v_pipeline_end_to_end():
    """Full guided sampling with controlnet residuals (tiny i2v)."""
    unet_cfg = tiny_unet_config()
    cn_cfg = tiny_cn_config(simplified=True)
    infer_cfg = InferenceConfig(
        inference_steps=4,
        guidance_steps=2,
        guidance_fraction=0.3,
        warm_up_steps=1,
        cool_up_steps=1,
        motion_guidance_weight=50.0,
        motion_guidance_blocks=("up_blocks.1",),
        width=W * 8,
        height=H * 8,
        video_length=F,
    )
    sched_cfg = NoiseScheduleConfig()

    unet = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 77, unet_cfg.cross_attention_dim))
    unet_params = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)

    cn_model = SparseControlNetModel(cfg=cn_cfg)
    cond0 = jnp.zeros((B, F, H, W, 4))
    mask0 = jnp.zeros((B, F, H, W, 1))
    cn_params = cn_model.init(
        jax.random.PRNGKey(1), sample, jnp.array([1]), ctx, cond0, mask0
    )

    pipe = MotionClonePipeline(
        unet_cfg,
        sched_cfg,
        infer_cfg,
        unet_params,
        dtype=jnp.float32,
        controlnet_apply=make_controlnet_apply(cn_model),
        cn_params=cn_params,
    )

    rng = np.random.default_rng(0)
    video_latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    uncond = jnp.asarray(rng.normal(size=(B, 77, unet_cfg.cross_attention_dim)), jnp.float32)
    cond_emb = jnp.asarray(rng.normal(size=(B, 77, unet_cfg.cross_attention_dim)), jnp.float32)

    frames = jnp.asarray(rng.normal(size=(B, 1, H, W, 4)), jnp.float32)
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    rep = pipe.extract_motion_representation(
        video_latents, uncond, seed=42, cn_cond=cn_cond
    )
    assert len(rep) == 4  # main UNet: 2 motion modules x 2 attention blocks
    out = pipe.sample_latents(uncond, cond_emb, rep, seed=7, cn_cond=cn_cond)
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()



def _i2v_setup(batch: int, seed: int, simplified: bool = True,
               **cfg_overrides):
    """Shared tiny-i2v fixture: configs, initialized UNet+controlnet, RNG
    inputs (latents/embeddings/condition frames), and a motion rep.

    ``simplified=False`` builds the PIXEL-conditioning flavor (the sketch
    workload: 3-channel condition at image resolution through the conv
    embedding stack — with 2 embedding levels here, image res = 2x the
    latent res)."""
    unet_cfg = tiny_unet_config()
    cn_cfg = tiny_cn_config(simplified=simplified)
    knobs = dict(
        inference_steps=3,
        guidance_steps=1,
        guidance_fraction=0.3,
        warm_up_steps=1,
        cool_up_steps=0,
        motion_guidance_weight=50.0,
        motion_guidance_blocks=("up_blocks.1",),
        width=W * 8,
        height=H * 8,
        video_length=F,
    )
    knobs.update(cfg_overrides)
    infer_cfg = InferenceConfig(**knobs)
    sched_cfg = NoiseScheduleConfig()

    unet = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    sample = jnp.zeros((1, F, H, W, 4))
    ctx = jnp.zeros((1, 77, unet_cfg.cross_attention_dim))
    unet_params = unet.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    cond_hw = H if simplified else H * 2
    cond_ch = cn_cfg.conditioning_channels
    cn_model = SparseControlNetModel(cfg=cn_cfg)
    cn_params = cn_model.init(
        jax.random.PRNGKey(1), sample, jnp.array([1]), ctx,
        jnp.zeros((1, F, cond_hw, cond_hw, cond_ch)),
        jnp.zeros((1, F, cond_hw, cond_hw, 1)),
    )

    rng = np.random.default_rng(seed)
    latents = jnp.asarray(rng.normal(size=(batch, F, H, W, 4)), jnp.float32)
    uncond = jnp.asarray(
        rng.normal(size=(batch, 77, unet_cfg.cross_attention_dim)), jnp.float32
    )
    cond_emb = jnp.asarray(
        rng.normal(size=(batch, 77, unet_cfg.cross_attention_dim)), jnp.float32
    )
    frames = jnp.asarray(
        rng.normal(size=(batch, 1, cond_hw, cond_hw, cond_ch)), jnp.float32
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
                    rng.uniform(0.2, 0.9, size=(batch, s_hw, heads, F, 1)),
                    jnp.float32,
                ),
                jnp.asarray(
                    rng.integers(0, F, size=(batch, s_hw, heads, F, 1)),
                    np.uint8,
                ),
            )
    return (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
            cn_params, latents, uncond, cond_emb, frames, rep)


def test_batched_controlnet_scale_matches_per_example():
    """Batched i2v with a per-example (B,1,1,1,1) conditioning-scale vector
    (the sweep path) reproduces per-example runs with float scales."""
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    nb = 2
    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(nb, seed=3)
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    scales = [1.0, 0.5]

    singles = []
    for i in range(nb):
        rep_i = {k: (v[i : i + 1], ix[i : i + 1]) for k, (v, ix) in rep.items()}
        out_i = fns.sample(
            unet_params, latents[i : i + 1], uncond[i : i + 1],
            cond_emb[i : i + 1], rep_i, cn_params,
            (cn_cond_t[i : i + 1], cn_mask[i : i + 1], scales[i]),
        )
        singles.append(np.asarray(out_i))
    singles = np.concatenate(singles, axis=0)

    scale_vec = jnp.asarray(scales, jnp.float32).reshape(-1, 1, 1, 1, 1)
    out = fns.sample(
        unet_params, latents, uncond, cond_emb, rep, cn_params,
        (cn_cond_t, cn_mask, scale_vec),
    )
    np.testing.assert_allclose(np.asarray(out), singles, atol=1e-3, rtol=2e-3)


def test_i2v_frame_sharded_matches_unsharded():
    """The GSPMD frame-sharding path with a controlnet (the i2v
    --frame-shard configuration) reproduces the unsharded result."""
    from motionclone_tpu.parallel.mesh import (
        frame_sharding,
        make_mesh_video,
        shard_params,
    )
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(B, seed=9)
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    ref = np.asarray(
        fns_ref.sample(unet_params, latents, uncond, cond_emb, rep,
                       cn_params, cn_cond)
    )

    mesh = make_mesh_video(frames=F)
    fsh = frame_sharding(mesh)
    # a Pallas-backed controlnet is rejected under GSPMD sharding...
    import pytest

    with pytest.raises(ValueError, match="Pallas-free controlnet"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
            controlnet_apply=make_controlnet_apply(cn_model),
            frame_sharding=fsh,
        )
    # ...so the sharded graph uses a chunked-impl rebuild (same params)
    cn_sharded = SparseControlNetModel(cfg=cn_cfg, attention_impl="chunked")
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_sharded),
        frame_sharding=fsh,
    )
    with mesh:
        out = fns.sample(
            shard_params(unet_params, mesh),
            jax.device_put(latents, fsh),
            uncond, cond_emb, rep,
            shard_params(cn_params, mesh),
            (jax.device_put(cn_cond_t, fsh), jax.device_put(cn_mask, fsh), 1.0),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_i2v_pixel_frame_sharded_matches_unsharded():
    """Sketch-workload flavor (pixel-space condition through the conv
    embedding stack) under GSPMD frame sharding: the image-resolution
    3-channel condition shards on its frame axis like every other video
    tensor, the embedding convs are per-frame (fully local), and the
    result matches unsharded — the CLI's ``--frame-shard`` composed with
    configs/i2v_sketch.yaml."""
    from motionclone_tpu.parallel.mesh import (
        frame_sharding,
        make_mesh_video,
        shard_params,
    )
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(
        B, seed=21, simplified=False
    )
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    ref = np.asarray(
        fns_ref.sample(unet_params, latents, uncond, cond_emb, rep,
                       cn_params, cn_cond)
    )

    mesh = make_mesh_video(frames=F)
    fsh = frame_sharding(mesh)
    cn_sharded = SparseControlNetModel(cfg=cn_cfg, attention_impl="chunked")
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_sharded),
        frame_sharding=fsh,
    )
    with mesh:
        out = fns.sample(
            shard_params(unet_params, mesh),
            jax.device_put(latents, fsh),
            uncond, cond_emb, rep,
            shard_params(cn_params, mesh),
            (jax.device_put(cn_cond_t, fsh), jax.device_put(cn_mask, fsh), 1.0),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_i2v_pixel_frame_shard_map_matches_unsharded():
    """Sketch flavor under the shard_map frame path: the frames_axis
    controlnet gathers its temporal K/V across shards while its pixel-
    space conditioning embeds shard-locally; matches unsharded."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video, shard_params
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(
        B, seed=23, simplified=False
    )
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    ref = np.asarray(
        fns_ref.sample(unet_params, latents, uncond, cond_emb, rep,
                       cn_params, cn_cond)
    )

    mesh = make_mesh_video(frames=F)
    cn_sharded = SparseControlNetModel(cfg=cn_cfg, frames_axis="frames")
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_sharded),
        frame_shard_map=mesh,
    )
    fsh = NamedSharding(mesh, P(None, "frames"))
    with mesh:
        out = fns.sample(
            shard_params(unet_params, mesh),
            jax.device_put(latents, fsh),
            uncond, cond_emb, rep,
            shard_params(cn_params, mesh),
            (jax.device_put(cn_cond_t, fsh), jax.device_put(cn_mask, fsh), 1.0),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_i2v_frame_shard_map_matches_unsharded():
    """The shard_map frame-sharding path now supports controlnet workloads:
    the SparseControlNet built with frames_axis='frames' gathers its own
    temporal K/V across the frame shards, and both extraction and guided
    sampling reproduce the unsharded i2v result."""
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video, shard_params
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(B, seed=13)
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    noise = jnp.asarray(
        np.random.default_rng(14).normal(size=latents.shape), jnp.float32
    )
    rep_ref = fns_ref.extract(unet_params, latents, noise, uncond,
                              cn_params, cn_cond)
    ref = np.asarray(
        fns_ref.sample(unet_params, latents, uncond, cond_emb, rep,
                       cn_params, cn_cond)
    )

    mesh = make_mesh_video(frames=F)
    # a controlnet without frame-shard collectives is rejected
    with pytest.raises(ValueError, match="frames_axis"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
            controlnet_apply=make_controlnet_apply(cn_model),
            frame_shard_map=mesh,
        )
    cn_sharded = SparseControlNetModel(cfg=cn_cfg, frames_axis="frames")
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_sharded),
        frame_shard_map=mesh,
    )
    fsh = NamedSharding(mesh, P(None, "frames"))
    p = shard_params(unet_params, mesh)
    cn_p = shard_params(cn_params, mesh)
    cn_cond_sh = (
        jax.device_put(cn_cond_t, fsh), jax.device_put(cn_mask, fsh), 1.0
    )
    with mesh:
        rep_sh = fns.extract(
            p, jax.device_put(latents, fsh), jax.device_put(noise, fsh),
            uncond, cn_p, cn_cond_sh,
        )
        out = fns.sample(
            p, jax.device_put(latents, fsh), uncond, cond_emb, rep,
            cn_p, cn_cond_sh,
        )
        out.block_until_ready()
    for k in rep_ref:
        np.testing.assert_allclose(
            np.asarray(rep_sh[k][0]), np.asarray(rep_ref[k][0]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(rep_sh[k][1]), np.asarray(rep_ref[k][1])
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    # per-call None conditioning cannot flow through the fixed in_specs
    with pytest.raises(ValueError, match="cn_cond"):
        fns.sample(p, latents, uncond, cond_emb, rep, cn_p, None)


def test_i2v_frame_shard_map_cfg_pair_matches_unsharded():
    """Fully composed single-video layout: ('cfg'=2, 'frames'=2) shard_map
    mesh with a frame-sharded controlnet reproduces the unsharded i2v
    result (CFG halves on separate cfg groups, frames split within)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video, shard_params
    from motionclone_tpu.pipeline.motionclone import make_sampling_fns

    (unet_cfg, cn_cfg, sched_cfg, infer_cfg, unet_params, cn_model,
     cn_params, latents, uncond, cond_emb, frames, rep) = _i2v_setup(B, seed=15)
    cn_cond_t, cn_mask = scatter_condition(frames, (0,), F)
    cn_cond = (cn_cond_t, cn_mask, 1.0)

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_model),
    )
    ref = np.asarray(
        fns_ref.sample(unet_params, latents, uncond, cond_emb, rep,
                       cn_params, cn_cond)
    )

    mesh = make_mesh_video(frames=2, cfg=2)  # 4 devices, 2 local frames
    cn_sharded = SparseControlNetModel(cfg=cn_cfg, frames_axis="frames")
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        controlnet_apply=make_controlnet_apply(cn_sharded),
        frame_shard_map=mesh,
    )
    fsh = NamedSharding(mesh, P(None, "frames"))
    with mesh:
        out = fns.sample(
            shard_params(unet_params, mesh),
            jax.device_put(latents, fsh), uncond, cond_emb, rep,
            shard_params(cn_params, mesh),
            (jax.device_put(cn_cond_t, fsh), jax.device_put(cn_mask, fsh), 1.0),
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)
