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


def test_guidance_cache_exact_at_zero_weight():
    """motion_guidance_weight=0 makes the guidance gradient identically
    zero — fresh and cached gradients agree, so the guidance-cache pipeline
    must match the exact one for any interval.  This pins the grad-cache
    plumbing (carry threading, refresh flags, the stale plain-forward
    cond_pred) against the exact path; the tolerance covers the stale
    branch computing cond_pred via the plain UNet graph instead of the
    aux-probs graph (separately compiled, XLA reassociation)."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(4, cfg_scale=7.5, motion_guidance_weight=0.0)
    )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    approx = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, guidance_interval=3
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(approx.sample(params, latents, uncond, cond, rep, None, None))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_guidance_cache_close_and_composes_with_uncond_cache():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(5, cfg_scale=7.5)
    )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    both = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        uncond_interval=2, guidance_interval=2,
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(both.sample(params, latents, uncond, cond, rep, None, None))
    assert np.isfinite(out).all()
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1.5, rel
    # it IS an approximation (random tiny weights amplify the delta)
    assert np.abs(out - ref).max() > 0


def test_guidance_refresh_runtime_override():
    """Like the uncond override: the guidance refresh interval is runtime
    data, so one executable serves every K_g."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(6, cfg_scale=7.5)
    )
    built2 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, guidance_interval=2
    )
    built3 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, guidance_interval=3
    )
    ref = np.asarray(built2.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(
        built3.sample(
            params, latents, uncond, cond, rep, None, None, guidance_refresh=2
        )
    )
    np.testing.assert_array_equal(out, ref)

    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="guidance_refresh"):
        exact.sample(
            params, latents, uncond, cond, rep, None, None, guidance_refresh=2
        )


def test_uncond_refresh_runtime_override():
    """The refresh interval is runtime data (scan-input flags): sampling a
    K=3-built fns with ``uncond_refresh=2`` must equal a K=2-built fns —
    one compiled executable serves every interval (what lets
    scripts/bench_approx.py sweep K without recompiles)."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(3, cfg_scale=7.5)
    )
    built2 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=2
    )
    built3 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=3
    )
    ref = np.asarray(built2.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(
        built3.sample(
            params, latents, uncond, cond, rep, None, None, uncond_refresh=2
        )
    )
    np.testing.assert_array_equal(out, ref)
    # and the two intervals through one fns genuinely differ
    out3 = np.asarray(built3.sample(params, latents, uncond, cond, rep, None, None))
    assert np.abs(out3 - ref).max() > 0

    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="uncond_refresh"):
        exact.sample(
            params, latents, uncond, cond, rep, None, None, uncond_refresh=2
        )
    with pytest.raises(ValueError, match="uncond_refresh"):
        built3.sample(
            params, latents, uncond, cond, rep, None, None, uncond_refresh=0
        )


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
    with pytest.raises(ValueError, match="guidance_interval"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, guidance_interval=0
        )
    mesh0 = make_mesh_2d(data=4, cfg=2)
    with pytest.raises(ValueError, match="CFG-pair"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, guidance_interval=2,
            cfg_pair_sharding=cfg_pair_sharding(mesh0),
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

    assert parse_approx("") == (1, 1, 0.0, 1, 0.0)
    assert parse_approx("uncond-cache") == (3, 1, 0.0, 1, 0.0)
    assert parse_approx("uncond-cache:2") == (2, 1, 0.0, 1, 0.0)
    assert parse_approx("guidance-cache") == (1, 2, 0.0, 1, 0.0)
    assert parse_approx("guidance-cache:4") == (1, 4, 0.0, 1, 0.0)
    assert parse_approx("uncond-cache:3,guidance-cache:2") == (3, 2, 0.0, 1, 0.0)
    assert parse_approx("guidance-cache:2, uncond-cache:5") == (5, 2, 0.0, 1, 0.0)
    assert parse_approx("uncond-extrap") == (3, 1, 1.0, 1, 0.0)
    assert parse_approx("uncond-extrap:5,guidance-cache:2") == (5, 2, 1.0, 1, 0.0)
    assert parse_approx("step-cache") == (1, 1, 0.0, 2, 0.0)
    assert parse_approx("step-cache:3") == (1, 1, 0.0, 3, 0.0)
    assert parse_approx("step-extrap") == (1, 1, 0.0, 2, 1.0)
    assert parse_approx("step-extrap:4") == (1, 1, 0.0, 4, 1.0)
    assert parse_approx("uncond-extrap:5,step-extrap:2") == (5, 1, 1.0, 2, 1.0)
    with pytest.raises(SystemExit):
        parse_approx("magic")
    with pytest.raises(SystemExit):
        parse_approx("uncond-cache:1")
    with pytest.raises(SystemExit):
        parse_approx("guidance-cache:1")
    with pytest.raises(SystemExit):
        parse_approx("step-cache:1")
    with pytest.raises(SystemExit):
        parse_approx("uncond-cache:3,magic")
    with pytest.raises(SystemExit):
        parse_approx("uncond-cache:3,uncond-extrap:3")
    with pytest.raises(SystemExit):
        parse_approx("step-cache:2,step-extrap:2")


def test_extrap_exact_at_zero_cfg_scale():
    """cfg_scale=0 removes the uncond term entirely, extrapolated or not —
    the extrap pipeline must equal the exact one."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(7, cfg_scale=0.0)
    )
    exact = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32
    )
    extrap = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        uncond_interval=2, uncond_extrap=1.0,
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(extrap.sample(params, latents, uncond, cond, rep, None, None))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_extrap_weight_is_runtime_data():
    """The extrapolation weight is a runtime scan column: a w=1.0-built fns
    dispatched with ``uncond_extrap_w=0.0`` must equal a plain-cache build,
    and w=1.0 must genuinely change the output vs the held cache."""
    # extrapolation needs two refresh anchors (n_ref >= 2) before it can
    # act, so the phases must be long enough for a second refresh plus a
    # later stale step: 4 guided + 4 vanilla steps at K=2 refresh at steps
    # 0 and 2 of each phase and extrapolate at step 3
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(8, cfg_scale=7.5, inference_steps=8, guidance_steps=4)
    )
    plain = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, uncond_interval=2
    )
    extrap = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        uncond_interval=2, uncond_extrap=1.0,
    )
    r_plain = np.asarray(
        plain.sample(params, latents, uncond, cond, rep, None, None)
    )
    r_w0 = np.asarray(
        extrap.sample(
            params, latents, uncond, cond, rep, None, None,
            uncond_extrap_w=0.0,
        )
    )
    r_w1 = np.asarray(
        extrap.sample(params, latents, uncond, cond, rep, None, None)
    )
    np.testing.assert_allclose(r_w0, r_plain, rtol=2e-5, atol=1e-6)
    assert np.isfinite(r_w1).all()
    assert np.abs(r_w1 - r_plain).max() > 0
    # extrapolation is a bounded perturbation of the held cache here
    rel = np.linalg.norm(r_w1 - r_plain) / (np.linalg.norm(r_plain) + 1e-9)
    assert rel < 1.5, rel


def test_extrap_guards():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(9)
    )
    with pytest.raises(ValueError, match="uncond_extrap"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
            uncond_extrap=1.0,
        )
    exact = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32
    )
    with pytest.raises(ValueError, match="uncond_extrap_w"):
        exact.sample(
            params, latents, uncond, cond, rep, None, None,
            uncond_extrap_w=1.0,
        )


def test_step_cache_all_refresh_is_exact():
    """A step-cache build dispatched with ``step_refresh=1`` runs the full
    branch on every step — the exact pipeline's math (equal up to XLA
    reassociation between the two separately compiled graphs).  This pins
    the whole-step cond plumbing (carry threading, anchor updates, the
    outer cond wrapping) against the exact path.  Tolerance is looser than
    the other cross-graph tests: the cond branches compile as separate
    computations (no fusion across the cond boundary), and cfg_scale=7.5
    over 6 steps amplifies the reassociation rounding (measured 1/1024
    elements at 2e-5 abs on CPU)."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(10, cfg_scale=7.5)
    )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    stepc = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=2
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(
        stepc.sample(
            params, latents, uncond, cond, rep, None, None, step_refresh=1
        )
    )
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=1e-4)


def test_step_cache_close_at_real_cfg_scale():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(11, cfg_scale=7.5)
    )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    stepc = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=2
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(stepc.sample(params, latents, uncond, cond, rep, None, None))
    assert np.isfinite(out).all()
    assert out.shape == ref.shape
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1.5, rel
    # it IS an approximation (skip steps hold the noise prediction)
    assert np.abs(out - ref).max() > 0


def test_step_refresh_runtime_override():
    """The step-skip interval is runtime data: a K=3-built fns dispatched
    with ``step_refresh=2`` must bit-for-bit equal a K=2-built fns."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(12, cfg_scale=7.5)
    )
    built2 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=2
    )
    built3 = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=3
    )
    ref = np.asarray(built2.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(
        built3.sample(
            params, latents, uncond, cond, rep, None, None, step_refresh=2
        )
    )
    np.testing.assert_array_equal(out, ref)

    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="step_refresh"):
        exact.sample(
            params, latents, uncond, cond, rep, None, None, step_refresh=2
        )
    with pytest.raises(ValueError, match="step_refresh"):
        built3.sample(
            params, latents, uncond, cond, rep, None, None, step_refresh=0
        )


def test_step_extrap_weight_is_runtime_data():
    """A step-extrap build dispatched with ``step_extrap_w=0.0`` must match
    a plain step-cache build; w=1.0 must genuinely change the output."""
    # two full-step anchors plus a later skip step per phase: 8 steps, K=2
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(13, cfg_scale=7.5, inference_steps=8, guidance_steps=4)
    )
    plain = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=2
    )
    extrap = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        step_interval=2, step_extrap=1.0,
    )
    r_plain = np.asarray(
        plain.sample(params, latents, uncond, cond, rep, None, None)
    )
    r_w0 = np.asarray(
        extrap.sample(
            params, latents, uncond, cond, rep, None, None, step_extrap_w=0.0
        )
    )
    r_w1 = np.asarray(
        extrap.sample(params, latents, uncond, cond, rep, None, None)
    )
    np.testing.assert_allclose(r_w0, r_plain, rtol=2e-5, atol=1e-6)
    assert np.isfinite(r_w1).all()
    assert np.abs(r_w1 - r_plain).max() > 0
    rel = np.linalg.norm(r_w1 - r_plain) / (np.linalg.norm(r_plain) + 1e-9)
    assert rel < 1.5, rel


def test_refresh_flags_count_executed_steps():
    """Finer-cache refresh schedules under the step cache count EXECUTED
    (full) steps: a refresh flag raised on a skipped step would be silently
    consumed without running (the uncond/guidance conds only evaluate
    inside the step-cache full branch), stretching the effective interval
    — e.g. K_u=5 under step-extrap:2 refreshed every 10th step."""
    from motionclone_tpu.pipeline.motionclone import _refresh_flags

    # plain schedule: every k-th absolute step, step 0 always
    f = np.asarray(_refresh_flags(8, 3))
    assert f.tolist() == [True, False, False, True, False, False, True, False]
    # executed-mask schedule: every k-th EXECUTED step (the ADVICE r3
    # scenario: K_u=5, K_s=2 -> refresh at absolute steps 0, 10, not the
    # old stretched {0, 10-via-consumed-5,15})
    ex = (np.arange(20) % 2) == 0
    f = np.asarray(_refresh_flags(20, 5, ex))
    assert np.flatnonzero(f).tolist() == [0, 10]
    # no refresh can land on a skipped step, for any alignment
    for k, s in [(2, 2), (3, 2), (5, 3), (4, 4)]:
        ex = (np.arange(24) % s) == 0
        f = np.asarray(_refresh_flags(24, k, ex))
        assert not (f & ~ex).any()
        # and exactly every k-th executed step refreshes
        assert np.flatnonzero(f[ex]).tolist() == list(
            range(0, int(ex.sum()), k)
        )


def test_uncond_cache_acts_under_step_cache():
    """Behavioral regression for the executed-step fix: with K_s=2, every
    2nd ABSOLUTE step is an executed step, so absolute-indexed K_u=2 flags
    refreshed on every executed step — bit-identical to K_u=1 (the cache
    never acted).  With executed-step counting, K_u=2 holds the uncond
    prediction on half the executed steps and the outputs must differ."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(16, cfg_scale=7.5, inference_steps=8, guidance_steps=4)
    )
    fns = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        uncond_interval=2, step_interval=2,
    )
    r_k1 = np.asarray(
        fns.sample(
            params, latents, uncond, cond, rep, None, None,
            uncond_refresh=1, step_refresh=2,
        )
    )
    r_k2 = np.asarray(
        fns.sample(
            params, latents, uncond, cond, rep, None, None,
            uncond_refresh=2, step_refresh=2,
        )
    )
    assert np.isfinite(r_k2).all()
    assert np.abs(r_k2 - r_k1).max() > 0


def test_step_cache_composes_with_finer_caches():
    """step-cache x uncond-cache x guidance-cache all on: the finer caches
    act on the steps the step cache runs; output stays finite/bounded."""
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(14, cfg_scale=7.5, inference_steps=8, guidance_steps=4)
    )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    allc = make_sampling_fns(
        unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32,
        uncond_interval=2, guidance_interval=2, step_interval=2,
    )
    ref = np.asarray(exact.sample(params, latents, uncond, cond, rep, None, None))
    out = np.asarray(allc.sample(params, latents, uncond, cond, rep, None, None))
    assert np.isfinite(out).all()
    rel = np.linalg.norm(out - ref) / (np.linalg.norm(ref) + 1e-9)
    assert rel < 1.5, rel


def test_step_cache_guards():
    unet_cfg, sched_cfg, infer_cfg, params, latents, uncond, cond, rep = (
        _setup(15)
    )
    with pytest.raises(ValueError, match="step_interval"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_interval=0
        )
    with pytest.raises(ValueError, match="step_extrap"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32, step_extrap=1.0
        )
    exact = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=jnp.float32)
    with pytest.raises(ValueError, match="step_extrap_w"):
        exact.sample(
            params, latents, uncond, cond, rep, None, None, step_extrap_w=1.0
        )
    from motionclone_tpu.parallel.mesh import cfg_pair_sharding, make_mesh_2d

    mesh = make_mesh_2d(data=4, cfg=2)
    with pytest.raises(ValueError, match="CFG-pair"):
        make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, step_interval=2,
            cfg_pair_sharding=cfg_pair_sharding(mesh),
        )
