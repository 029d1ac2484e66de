"""Data-parallel correctness: batched sharded sampling must reproduce
per-example results (8 virtual CPU devices)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import (
    Example,
    InferenceConfig,
    NoiseScheduleConfig,
    tiny_unet_config,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
    shard_params,
)
from motionclone_tpu.pipeline.motionclone import make_sampling_fns
from motionclone_tpu.pipeline.sweep import batch_examples

B, F, H, W = 4, 4, 8, 8  # batch of 4 examples over a 4-device mesh

def _tiny_setup(batch: int, seed: int, **cfg_overrides):
    """Shared fixture: tiny UNet + config + RNG inputs + motion rep.

    Returns (unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond,
    rep) with ``batch`` examples drawn from ``np.random.default_rng(seed)``.
    """
    unet_cfg = tiny_unet_config()
    sched_cfg = NoiseScheduleConfig()
    knobs = dict(
        inference_steps=3,
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
    knobs.update(cfg_overrides)
    infer_cfg = InferenceConfig(**knobs)
    model = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, F, H, W, 4)),
        jnp.array([1]),
        jnp.zeros((1, 77, unet_cfg.cross_attention_dim)),
    )
    rng = np.random.default_rng(seed)
    latents = jnp.asarray(rng.normal(size=(batch, F, H, W, 4)), jnp.float32)
    uncond = jnp.asarray(
        rng.normal(size=(batch, 77, unet_cfg.cross_attention_dim)), jnp.float32
    )
    cond = jnp.asarray(
        rng.normal(size=(batch, 77, unet_cfg.cross_attention_dim)), jnp.float32
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
    return unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep



def test_batch_examples_padding():
    exs = [Example(video_path=f"v{i}.mp4", new_prompt="p") for i in range(5)]
    batches = batch_examples(exs, 4)
    assert len(batches) == 2
    assert len(batches[0][0]) == 4 and batches[0][1] == 4
    assert len(batches[1][0]) == 4 and batches[1][1] == 1
    assert batches[1][0][1].video_path == "v4.mp4"  # padded by repetition


def test_sharded_batch_matches_per_example():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(B, seed=0)
    )
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )

    # per-example (unsharded, batch 1)
    singles = []
    for i in range(B):
        rep_i = {k: (v[i : i + 1], idx[i : i + 1]) for k, (v, idx) in rep.items()}
        out_i = fns.sample(
            params, latents[i : i + 1], uncond[i : i + 1], cond[i : i + 1],
            rep_i, None, None,
        )
        singles.append(np.asarray(out_i))
    singles = np.concatenate(singles, axis=0)

    # batched + sharded over a 4-device data mesh
    mesh = make_mesh(4)
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p,
            shard_batch(latents, mesh),
            shard_batch(uncond, mesh),
            shard_batch(cond, mesh),
            jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), rep),
            None,
            None,
        )
        out.block_until_ready()
    assert out.sharding.is_equivalent_to(batch_sharding(mesh), out.ndim)
    np.testing.assert_allclose(np.asarray(out), singles, atol=2e-4, rtol=1e-3)


def test_cfg_pair_sharding_matches_data_only():
    """(data, cfg) 2-axis mesh: the vanilla CFG pair split over ``cfg``
    reproduces the data-parallel-only result."""
    from motionclone_tpu.parallel.mesh import cfg_pair_sharding, make_mesh_2d

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(B, seed=1, guidance_steps=1, cool_up_steps=0)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_2d(data=4, cfg=2)
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        cfg_pair_sharding=cfg_pair_sharding(mesh),
    )
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p,
            shard_batch(latents, mesh),
            shard_batch(uncond, mesh),
            shard_batch(cond, mesh),
            jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), rep),
            None,
            None,
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_sharded_sample_resume(tmp_path):
    """Resume of a batched, data-sharded sampling run is exact, and a
    checkpoint with a different content tag is ignored (sweep resume)."""
    import os

    import pytest

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(B, seed=0)
    )
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )

    mesh = make_mesh(4)
    p = shard_params(params, mesh)
    sh = lambda a: shard_batch(a, mesh)  # noqa: E731
    args = (
        p, sh(latents), sh(uncond), sh(cond),
        jax.tree_util.tree_map(sh, rep), None, None,
    )
    path = str(tmp_path / "r.npz")

    with mesh:
        ref = np.asarray(fns.sample(*args))

    class Stop(Exception):
        pass

    def boom(done, total):
        if done >= 2:  # after the guided chunk (2 of 3 steps)
            raise Stop

    with mesh:
        with pytest.raises(Stop):
            fns.sample(*args, resume_path=path, on_chunk=boom, resume_tag="t")
        assert os.path.exists(path)

        # wrong tag -> checkpoint ignored, full fresh run (2 chunks seen)
        seen = []
        fns.sample(
            *args, resume_path=path, resume_tag="other",
            on_chunk=lambda d, t: seen.append(d),
        )
        assert seen == [2, 3]

        # right tag -> resumes at the vanilla chunk only, exact result
        with pytest.raises(Stop):
            fns.sample(*args, resume_path=path, on_chunk=boom, resume_tag="t")
        seen = []
        out = fns.sample(
            *args, resume_path=path, resume_tag="t",
            on_chunk=lambda d, t: seen.append(d),
        )
        assert seen == [3]
        assert not os.path.exists(path)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_frame_sharded_matches_unsharded():
    """Frame-axis (single-video latency) sharding reproduces the unsharded
    result: (B, F, H, W, C) tensors split over a ``frames`` mesh axis, with
    the temporal-attention collectives emitted by GSPMD."""
    from motionclone_tpu.parallel.mesh import frame_sharding, make_mesh_video

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(1, seed=2)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_video(frames=F)  # F frames over F devices, cfg=1
    fsh = frame_sharding(mesh)
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        frame_sharding=fsh,
    )
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p,
            jax.device_put(latents, fsh),
            uncond, cond, rep, None, None,
        )
        out.block_until_ready()
    assert out.sharding.is_equivalent_to(fsh, out.ndim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_frame_and_cfg_pair_sharding_matches_unsharded():
    """(cfg, frames) mesh: CFG pair over ``cfg`` AND frames over ``frames``
    — the full single-video latency layout on 2x4 chips."""
    from motionclone_tpu.parallel.mesh import (
        cfg_pair_sharding as cfg_pair,
        frame_sharding,
        make_mesh_video,
    )

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(1, seed=3, guidance_steps=1, cool_up_steps=0)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_video(frames=F, cfg=2)  # 2 x F devices
    fsh = frame_sharding(mesh)
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        cfg_pair_sharding=cfg_pair(mesh),
        frame_sharding=fsh,
    )
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p,
            jax.device_put(latents, fsh),
            uncond, cond, rep, None, None,
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_frame_shard_map_matches_unsharded():
    """shard_map frame sharding (explicit temporal-attention all_gathers,
    per-shard partial guidance loss, per-shard kernels) reproduces the
    unsharded result for both extraction and guided sampling."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(1, seed=6)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    noise = jnp.asarray(
        np.random.default_rng(7).normal(size=latents.shape), jnp.float32
    )
    rep_ref = fns_ref.extract(params, latents, noise, uncond, None, None)
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_video(frames=F)
    fsh = NamedSharding(mesh, P(None, "frames"))
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        frame_shard_map=mesh,
    )
    p = shard_params(params, mesh)
    lat_sh = jax.device_put(latents, fsh)
    with mesh:
        rep_sm = fns.extract(p, lat_sh, jax.device_put(noise, fsh), uncond,
                             None, None)
        for k in rep_ref:
            np.testing.assert_allclose(
                np.asarray(rep_sm[k][0]), np.asarray(rep_ref[k][0]),
                atol=2e-5, rtol=1e-4,
            )
            # argmax indices drive the guided loss gather: a PE-offset or
            # gather-order bug would permute them while barely moving the
            # max values
            np.testing.assert_array_equal(
                np.asarray(rep_sm[k][1]), np.asarray(rep_ref[k][1])
            )
        out = fns.sample(p, lat_sh, uncond, cond, rep, None, None)
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_frame_shard_map_validates():
    """Option conflicts fail fast: controlnet, non-inflated GroupNorm, and
    mixing the two frame-sharding flavors."""
    import dataclasses

    import pytest

    from motionclone_tpu.parallel.mesh import (
        frame_sharding,
        make_mesh_video,
    )

    unet_cfg, sched_cfg, infer_cfg, *_ = _tiny_setup(1, seed=0)
    mesh = make_mesh_video(frames=F)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, frame_shard_map=mesh,
            frame_sharding=frame_sharding(mesh),
        )
    with pytest.raises(ValueError, match="controlnet"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, frame_shard_map=mesh,
            controlnet_apply=lambda *a: None,
        )
    cfg_gn = dataclasses.replace(unet_cfg, use_inflated_groupnorm=False)
    with pytest.raises(ValueError, match="inflated"):
        make_sampling_fns(
            cfg_gn, sched_cfg, infer_cfg, frame_shard_map=mesh
        )


def test_data_frames_sharding_matches_unsharded():
    """(data, frames) mesh: examples over ``data`` AND each example's frame
    axis over ``frames`` (the composed sweep layout) reproduces the plain
    batched result."""
    from motionclone_tpu.parallel.mesh import (
        frame_sharding,
        make_mesh_data_frames,
    )

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(2, seed=10, guidance_steps=1, cool_up_steps=0)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_data_frames(data=2, frames=F)  # 2 x 4 devices
    fsh = frame_sharding(mesh)
    assert fsh.spec == (  # batch over data AND frames over frames
        jax.sharding.PartitionSpec("data", "frames")
    )
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        frame_sharding=fsh,
    )
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p,
            jax.device_put(latents, fsh),
            uncond, cond, rep, None, None,
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_sharded_temporal_module_uses_rect_kernel():
    """VanillaTemporalModule under shard_map: all_gathered K/V + the
    rectangular packed temporal kernel (shapes chosen so pick_tile fires:
    2 local frames x ts=64) reproduce the unsharded module exactly."""
    from jax.sharding import PartitionSpec as P

    from motionclone_tpu.config import MotionModuleConfig
    from motionclone_tpu.models.motion_module import VanillaTemporalModule
    from motionclone_tpu.ops.temporal_attention import pick_tile
    from motionclone_tpu.parallel.mesh import make_mesh_video

    f_total, hh, ww, c = 8, 16, 16, 16
    assert pick_tile(f_total // 4, hh * ww) is not None  # kernel engages
    cfg = MotionModuleConfig(
        num_attention_heads=2,
        num_transformer_block=1,
        attention_block_types=("Temporal_Self", "Temporal_Self"),
        temporal_position_encoding=True,
        temporal_position_encoding_max_len=24,
        norm_num_groups=4,
    )
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(1, f_total, hh, ww, c)), jnp.float32)

    base = VanillaTemporalModule(cfg=cfg)
    params = base.init(jax.random.PRNGKey(0), x)
    # zero-init proj_out makes the module an identity; perturb so the
    # attention output actually reaches the comparison
    params = jax.tree_util.tree_map(lambda a: a + 0.05, params)
    ref, _ = base.apply(params, x)

    mesh = make_mesh_video(frames=4)
    sharded = VanillaTemporalModule(cfg=cfg, frames_axis="frames")

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "frames")),
        out_specs=P(None, "frames"),
        check_vma=False,  # Pallas out_shapes carry no vma metadata
    )
    def run(p, xs):
        out, _ = sharded.apply(p, xs)
        return out

    out = run(params, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-4
    )

    # gradients: the rect kernel's custom VJP must compose with the
    # all_gather transpose (reduce_scatter of dk/dv across shards) — the
    # exact path the guided phase runs on TPU
    w = jnp.asarray(rng.normal(size=x.shape), jnp.float32)

    g_ref = jax.grad(
        lambda xs: jnp.sum(w * base.apply(params, xs)[0])
    )(x)

    @jax.jit
    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(None, "frames"), P(None, "frames")),
        out_specs=P(None, "frames"),
        check_vma=False,
    )
    def grad_sharded(p, xs, ws):
        # per-shard partial objective; cross-shard terms arrive through the
        # all_gather transpose (same contract as the guidance loss)
        return jax.grad(lambda xl: jnp.sum(ws * sharded.apply(p, xl)[0]))(xs)

    g = grad_sharded(params, x, w)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), atol=5e-5, rtol=1e-4
    )


def test_make_mesh_video_validates_axis_sizes():
    import pytest

    from motionclone_tpu.parallel.mesh import make_mesh_video

    with pytest.raises(ValueError, match=">= 1"):
        make_mesh_video(frames=-2)
    with pytest.raises(ValueError, match=">= 1"):
        make_mesh_video(frames=2, cfg=0)


def test_sweep_cfg_pair_validates_device_count(tmp_path):
    """cfg_pair sweeps need an even device count (pairs ride the cfg axis)."""
    import types

    import pytest

    from motionclone_tpu.pipeline.sweep import run_sweep

    dummy = types.SimpleNamespace(infer_cfg=None)
    with pytest.raises(ValueError, match="even device count"):
        run_sweep(
            dummy, [],
            motion_rep_dir=str(tmp_path / "rep"),
            output_dir=str(tmp_path / "out"),
            num_devices=3,
            cfg_pair=True,
        )

    dummy_f = types.SimpleNamespace(
        infer_cfg=types.SimpleNamespace(video_length=4)
    )
    common = dict(
        motion_rep_dir=str(tmp_path / "rep"),
        output_dir=str(tmp_path / "out"),
    )
    with pytest.raises(ValueError, match="only in shardmap mode"):
        run_sweep(dummy_f, [], num_devices=4, cfg_pair=True, frame_shard=2,
                  **common)
    with pytest.raises(ValueError, match="divide"):
        run_sweep(dummy_f, [], num_devices=6, frame_shard=3, **common)
    with pytest.raises(ValueError, match="divide the device count"):
        run_sweep(dummy_f, [], num_devices=5, frame_shard=2, **common)


def test_frame_shard_map_cfg_pair_matches_unsharded():
    """Composed shard_map layout: a ('cfg'=2, 'frames') mesh splits the CFG
    pair across cfg groups (masked-psum pair steps) AND the frame axis
    within each group — must reproduce the unsharded serial result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(1, seed=11)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    mesh = make_mesh_video(frames=F, cfg=2)  # 2 x 4 devices
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        frame_shard_map=mesh,
    )
    fsh = NamedSharding(mesh, P(None, "frames"))
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p, jax.device_put(latents, fsh), uncond, cond, rep, None, None
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)

    # extraction under the composed mesh (cfg groups replicate it)
    noise = jnp.asarray(
        np.random.default_rng(12).normal(size=latents.shape), jnp.float32
    )
    rep_ref = fns_ref.extract(params, latents, noise, uncond, None, None)
    with mesh:
        rep_sh = fns.extract(
            p, jax.device_put(latents, fsh), jax.device_put(noise, fsh),
            uncond, None, None,
        )
    for k in rep_ref:
        np.testing.assert_allclose(
            np.asarray(rep_sh[k][0]), np.asarray(rep_ref[k][0]),
            atol=2e-5, rtol=1e-4,
        )
        np.testing.assert_array_equal(
            np.asarray(rep_sh[k][1]), np.asarray(rep_ref[k][1])
        )


def test_frame_shard_map_rejects_wide_cfg_axis():
    import pytest

    from motionclone_tpu.parallel.mesh import make_mesh_video

    unet_cfg, sched_cfg, infer_cfg, *_ = _tiny_setup(1, seed=0)
    with pytest.raises(ValueError, match="size 1 or 2"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg,
            frame_shard_map=make_mesh_video(frames=2, cfg=4),
        )


def test_approx_step_extrap_under_frame_shard_map():
    """The recommended --approx operating point (step-extrap) composes with
    shardmap frame sharding: the frame-sharded approx run must reproduce
    the unsharded approx run (same executed/skip schedule, local per-shard
    caches).  Proves the recommended operating point under the parallel
    mode (VERDICT r3 ask #7)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_video

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(1, seed=17, inference_steps=6, guidance_steps=3)
    )
    approx = dict(uncond_interval=2, guidance_interval=2, step_interval=2)
    dispatch = dict(
        uncond_refresh=2, guidance_refresh=2, step_refresh=2,
        step_extrap_w=1.0,
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        **approx,
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None,
                       **dispatch)
    )
    # the caches genuinely act on this schedule (it IS an approximation)
    exact = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None,
                       uncond_refresh=1, guidance_refresh=1, step_refresh=1)
    )
    assert np.abs(ref - exact).max() > 0

    mesh = make_mesh_video(frames=F)
    fsh = NamedSharding(mesh, P(None, "frames"))
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False,
        frame_shard_map=mesh, **approx,
    )
    p = shard_params(params, mesh)
    with mesh:
        out = fns.sample(
            p, jax.device_put(latents, fsh), uncond, cond, rep, None, None,
            **dispatch,
        )
        out.block_until_ready()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-3)


def test_frame_shard_map_data_axis_matches_unsharded():
    """shard_map sweep layout: a ('data', 'cfg', 'frames') mesh shards the
    example batch over 'data' (and optionally the CFG pair + frames) —
    both the (2-data x 4-frames) and the fully composed
    (2-data x 2-cfg x 2-frames) layouts must reproduce the plain batched
    result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from motionclone_tpu.parallel.mesh import make_mesh_sweep

    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _tiny_setup(2, seed=16, guidance_steps=1, cool_up_steps=0)
    )

    fns_ref = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, remat_guided=False
    )
    ref = np.asarray(
        fns_ref.sample(params, latents, uncond, cond, rep, None, None)
    )

    for layout in ((2, 1, 4), (2, 2, 2)):
        data, cfgx, frames = layout
        mesh = make_mesh_sweep(data=data, cfg=cfgx, frames=frames)
        fns = make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
            remat_guided=False, frame_shard_map=mesh,
        )
        vsh = NamedSharding(mesh, P("data", "frames"))
        esh = NamedSharding(mesh, P("data"))
        p = shard_params(params, mesh)
        rep_sh = {
            k: (jax.device_put(v, esh), jax.device_put(ix, esh))
            for k, (v, ix) in rep.items()
        }
        with mesh:
            out = fns.sample(
                p, jax.device_put(latents, vsh),
                jax.device_put(uncond, esh), jax.device_put(cond, esh),
                rep_sh, None, None,
            )
            out.block_until_ready()
        np.testing.assert_allclose(
            np.asarray(out), ref, atol=2e-4, rtol=1e-3,
            err_msg=f"layout {layout}",
        )
