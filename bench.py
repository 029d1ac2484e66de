"""Benchmark: 16-frame 512x512 guided video sampling on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver-defined north
star is < 30 s per guided video on one v5e chip, so ``vs_baseline`` reports
30 / measured_seconds (>1 means beating the target).

The headline is the full t2v_camera sampling workload
(configs/t2v_camera.yaml: 100 DDIM steps, 50 guided with grad-through-UNet)
plus whole-clip VAE decode, on random bf16 weights (no checkpoints are
shipped in this environment; FLOP/byte costs are weight-value independent).
The JSON line additionally carries the reference's other flagship
schedules: t2v_object (configs/t2v_object.yaml: 300 steps / 180 guided —
the same compiled step graphs, 3x the step count) and i2v
(configs/i2v_rgb.yaml: 100 steps / 40 guided, +1 SparseCtrl controlnet
forward per CFG half per step — reference motionclone_functions.py:190-197).

Kill-resilience (the r03 driver artifact died rc=124 with zero JSON out):
the JSON dict is STAGED as each section completes and printed by an
atexit/SIGTERM handler, so an external kill at any point still yields every
key measured so far.  Sections after the required headline run as guarded
closures, ordered by value — phase timing, the recommended approx point,
i2v, t2v_object, i2v_sketch, extra approx points: a section that would not
fit the remaining wall budget (BENCH_BUDGET_S, default 1050 s — sized
against the driver's observed external timeout, see the constant below) is
skipped, and a section that CRASHES is absorbed (named in the ``skipped``
key) instead of killing the sections after it.  Backend acquisition
retries across the wedged-tunnel window (the r04 failure mode) before any
section runs — see ``acquire_devices``.  Running each section body as a function
also drops its device buffers on return — the i2v controlnet params +
executables left resident previously pushed the t2v_object guided chunk
over the 15.75 GB HBM (measured RESOURCE_EXHAUSTED).
"""

import atexit
import gc
import json
import os
import signal
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: first run pays ~10 min of XLA compiles, reruns
# skip.  setup_compile_cache also makes the cache keys survive source
# edits (tracebacks-in-locations off — its docstring has the measured
# failure mode this prevents; a bench.py edit used to recompile EVERY
# executable, which is what starved the r03 driver artifact).
from motionclone_tpu.utils.compile_cache import setup_compile_cache  # noqa: E402

setup_compile_cache()

from motionclone_tpu.config import (  # noqa: E402
    InferenceConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel  # noqa: E402
from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from motionclone_tpu.pipeline.motionclone import make_sampling_fns  # noqa: E402

GUIDANCE_BLOCKS = ("up_blocks.1",)
TARGET_SECONDS = 30.0

# --smoke: tiny model on the CPU backend — validates every section's
# plumbing (schedules, chunking, controlnet wiring, the overlapped fetch,
# the staged-JSON/budget machinery) in minutes, so a bench-code error can
# never surface for the first time on the driver's real-TPU run.  Timings
# meaningless.  Forced via jax.config (env vars are too late: sitecustomize
# imports jax first).
SMOKE = "--smoke" in sys.argv
if SMOKE:
    jax.config.update("jax_platforms", "cpu")

START = time.time()
# default sized against the driver's observed external timeout: the r03
# artifact was killed at >=1100 s elapsed (its log reaches ~1140 s), so a
# 1050 s budget leaves margin while fitting the full warm section set
# (measured: headline+phase 205, approx 120, i2v 230, t2v_object 290,
# extra approx points 70 — ~930 s total; i2v_sketch is the one section
# that still only fits an enlarged BENCH_BUDGET_S run)
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1050"))

# ---- staged results: whatever exists at exit IS the artifact ----------
RESULTS = {
    "metric": (
        "SMOKE_tiny_plumbing_check" if SMOKE
        else "sec_per_video_t2v_camera_512x512x16f"
    ),
    "value": None,
    "unit": "s",
    "vs_baseline": None,
    "skipped": [],
}
_emitted = False


def _emit():
    global _emitted
    if _emitted:
        return
    _emitted = True
    out = {k: v for k, v in RESULTS.items() if v != [] or k != "skipped"}
    print(json.dumps(out), flush=True)


def _on_term(signum, frame):
    log(f"signal {signum} after {time.time()-START:.0f}s — emitting staged JSON")
    _emit()
    # bypass further atexit double-handling; 128+signum is the usual rc
    os._exit(128 + signum)


atexit.register(_emit)
signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)


def log(msg):
    print(f"[{time.time()-START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def stage(**kv):
    RESULTS.update(kv)


def fits(name, est_s):
    """Budget guard: run a section only if its (warm-cache) estimated cost
    fits the remaining wall budget; otherwise record the skip."""
    left = BUDGET_S - (time.time() - START)
    if est_s <= left:
        return True
    log(f"SKIP {name}: est {est_s:.0f}s > {left:.0f}s left of {BUDGET_S:.0f}s")
    RESULTS["skipped"].append(name)
    return False


def _probe_devices(timeout_s):
    """One ``jax.devices()`` attempt in a daemon thread.

    A wedged axon relay can make the call HANG (0% CPU, CLAUDE.md "TPU
    environment gotchas"), not just raise — so the attempt itself must be
    time-bounded.  Returns (devices_or_None, error_string_or_None).  A
    thread that is still blocked at the timeout is abandoned (daemon;
    ``os._exit`` paths below never join it)."""
    import threading

    result = {}

    def run():
        try:
            result["devs"] = jax.devices()
        except Exception as e:  # noqa: BLE001 — classified by the caller
            result["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        return None, f"jax.devices() still blocked after {timeout_s:.0f}s"
    return result.get("devs"), result.get("err")


def acquire_devices():
    """Backend acquisition that survives a down/wedged axon tunnel.

    The r04 driver artifact was nulled by a single
    ``Unable to initialize backend 'axon': UNAVAILABLE`` raised straight
    through at first touch — a transient CLAUDE.md documents as clearing in
    ~3-5 minutes.  jax retries platform init on every ``jax.devices()``
    call while no backend has registered (xla_bridge.backends() only
    caches a NON-empty ``_backends``), so an in-process retry loop is
    sound.  Retries until ``min(480 s, 0.6 * BENCH_BUDGET_S)`` from start;
    if the backend never comes up, stages ``backend_unavailable`` plus the
    error tail so the artifact is diagnosable rather than null, emits, and
    exits."""
    deadline = START + min(480.0, 0.6 * BUDGET_S)
    attempt = 0
    last_err = None
    while True:
        attempt += 1
        devs, err = _probe_devices(90.0)
        if devs is not None and (SMOKE or devs[0].platform != "cpu"):
            if attempt > 1:
                log(f"backend recovered on attempt {attempt}")
                stage(backend_retries=attempt - 1)
            return devs
        if devs is not None:
            # JAX fell back to CPU without the TPU plugin — timing the
            # workload there would stage a silently-garbage headline
            err = f"no TPU backend: devices()={devs!r}"
        last_err = err
        left = deadline - time.time()
        log(f"backend attempt {attempt} failed: {err}")
        if left <= 0:
            log(
                f"backend never came up within the retry deadline "
                f"({attempt} attempts) — emitting failure artifact"
            )
            stage(
                backend_unavailable=True,
                backend_error=(last_err or "")[-500:],
                backend_attempts=attempt,
            )
            _emit()
            os._exit(1)
        sleep_s = min(45.0, left)
        log(f"retrying in {sleep_s:.0f}s ({left:.0f}s left before giving up)")
        time.sleep(sleep_s)


def guard(name, est_s, body):
    """Run one optional section: budget-gated, crash-absorbed.

    A section that raises is logged into ``skipped`` and later sections
    still run; its device buffers (locals of ``body``) are dropped either
    way, so one section's working set never squeezes the next one out of
    HBM."""
    if not (SMOKE or fits(name, est_s)):
        return
    try:
        body()
    except Exception as e:  # noqa: BLE001 — the artifact must survive
        log(f"SECTION {name} FAILED: {type(e).__name__}: {e}")
        RESULTS["skipped"].append(f"{name}(failed:{type(e).__name__})")
    finally:
        gc.collect()


def main():
    # first device touch — retried across the wedged-tunnel window so one
    # transient UNAVAILABLE can no longer null the whole round's artifact
    devices = acquire_devices()
    log(f"devices: {devices}; budget {BUDGET_S:.0f}s")
    if SMOKE:
        from motionclone_tpu.config import tiny_unet_config

        unet_cfg = tiny_unet_config()
        size, n_frames = 64, 4
    else:
        unet_cfg = UNet3DConfig()
        size, n_frames = 512, 16
    ctx_dim = unet_cfg.cross_attention_dim
    sched_cfg = NoiseScheduleConfig()
    # t2v_camera knobs (configs/t2v_camera.yaml)
    infer_cfg = InferenceConfig(
        inference_steps=100,
        guidance_steps=50,
        guidance_fraction=0.3,
        warm_up_steps=10,
        cool_up_steps=10,
        motion_guidance_weight=2000.0,
        motion_guidance_blocks=GUIDANCE_BLOCKS,
        width=size,
        height=size,
        video_length=n_frames,
        cfg_scale=7.5,
    )
    dtype = jnp.bfloat16
    B, F = 1, infer_cfg.video_length
    H = W = infer_cfg.height // 8

    # the axon tunnel relay and the dispatch loop are host processes: a
    # loaded machine (e.g. a concurrent test suite) inflates the measured
    # time >10x — flag it rather than silently reporting a garbage number
    load = os.getloadavg()[0]
    ncpu = os.cpu_count() or 1
    if load > 0.5 * ncpu:
        log(
            f"WARNING: host load {load:.1f} on {ncpu} CPUs — timings will "
            f"not be representative; run bench.py on an idle machine"
        )
    model = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=GUIDANCE_BLOCKS, dtype=dtype
    )
    sample0 = jnp.zeros((B, F, H, W, 4), dtype)
    ctx0 = jnp.zeros((B, 77, ctx_dim), dtype)
    t0 = time.time()
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), sample0, jnp.array([1]), ctx0)
    )()
    jax.block_until_ready(params)
    log(f"unet params initialized in {time.time()-t0:.0f}s")

    if SMOKE:
        from motionclone_tpu.models.vae import tiny_vae_config

        vae_cfg = tiny_vae_config()
    else:
        vae_cfg = VAEConfig()
    vae = AutoencoderKL(cfg=vae_cfg, dtype=dtype)
    t0 = time.time()
    vae_params = jax.jit(
        lambda: vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 16, 16, 3), dtype))
    )()
    jax.block_until_ready(vae_params)
    log(f"vae params initialized in {time.time()-t0:.0f}s")

    def _decode_uint8(p, z):
        video = vae.apply(p, z, method=vae.decode)
        video01 = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        return jnp.round(video01 * 255.0).astype(jnp.uint8)

    decode = jax.jit(_decode_uint8)

    def fetch_video(z, n_chunks=2):
        """Decode + fetch the clip in frame slices: the host fetch of slice
        i overlaps slice i+1's device execution (async dispatch), hiding
        decode time behind the unavoidable ~12.6 MB uint8 fetch."""
        parts = jnp.split(z.astype(dtype), n_chunks, axis=1)
        outs = [decode(vae_params, p) for p in parts]
        return np.concatenate([np.asarray(o) for o in outs], axis=1)

    fns = make_sampling_fns(unet_cfg, sched_cfg, infer_cfg, dtype=dtype)

    rng = np.random.default_rng(0)

    def rand_latents():
        return jnp.asarray(
            rng.normal(size=(B, F, H, W, 4)), jnp.float32
        ).astype(dtype)

    latents = rand_latents()
    uncond = jnp.asarray(rng.normal(size=(B, 77, ctx_dim)), jnp.float32).astype(dtype)
    cond = jnp.asarray(rng.normal(size=(B, 77, ctx_dim)), jnp.float32).astype(dtype)
    if SMOKE:
        # real extraction gives the correctly-shaped rep for any config
        noise = rand_latents()
        rep = fns.extract(params, latents, noise, uncond, None, None)
    else:
        s_hw = 16 * 16  # up_blocks.1 spatial positions at 512^2
        rep = {}
        for m in range(3):
            for a in range(2):
                name = (
                    f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                    f".transformer_blocks.0.attention_blocks.{a}"
                )
                rep[name] = (
                    jnp.asarray(rng.uniform(0.2, 0.9, size=(B, s_hw, 8, F, 1)), jnp.float32),
                    jnp.asarray(rng.integers(0, F, size=(B, s_hw, 8, F, 1)), np.uint8),
                )

    # ---- headline: t2v_camera exact path (REQUIRED — no guard) ----------
    # warm-up: compile sampling scan + decode
    t0 = time.time()
    out = fns.sample(params, latents, uncond, cond, rep, None, None)
    jax.block_until_ready(fetch_video(out))
    log(f"compile+first run: {time.time()-t0:.0f}s")

    # timed run (different seed latents so nothing can be elided)
    t0 = time.time()
    out = fns.sample(params, rand_latents(), uncond, cond, rep, None, None)
    fetch_video(out)  # decode + full host fetch
    elapsed = time.time() - t0
    steps_per_sec = infer_cfg.inference_steps / elapsed
    log(
        f"sampling: {elapsed:.2f}s/video, {steps_per_sec:.2f} denoise steps/s/chip"
    )
    stage(
        value=round(elapsed, 3),
        vs_baseline=round(TARGET_SECONDS / elapsed, 3),
        steps_per_sec=round(steps_per_sec, 3),
    )
    del out
    gc.collect()

    # ---- per-phase attribution: dispatch each phase's chunk alone (same
    # compiled executables as the 50-step chunks above) with fresh latents
    # (the tunnel dedupes identical dispatches) and fetch a scalar to sync
    def sec_phase_timing():
        g_xs, v_xs = fns.phase_xs
        t0 = time.time()
        lat_g = fns.guided_chunk(
            params, rand_latents(), uncond, cond, rep, None, None, g_xs
        )
        float(lat_g.ravel()[0])
        guided_ms = (time.time() - t0) * 1000.0 / len(g_xs[0])
        t0 = time.time()
        lat_v = fns.vanilla_chunk(params, lat_g, uncond, cond, rep, None, None, v_xs)
        float(lat_v.ravel()[0])
        vanilla_ms = (time.time() - t0) * 1000.0 / len(v_xs[0])
        log(
            f"phase timing: guided {guided_ms:.1f} ms/step x {len(g_xs[0])}, "
            f"vanilla {vanilla_ms:.1f} ms/step x {len(v_xs[0])}"
        )
        stage(
            guided_ms_per_step=round(guided_ms, 1),
            vanilla_ms_per_step=round(vanilla_ms, 1),
        )

    guard("phase_timing", 50, sec_phase_timing)

    # ---- opt-in approx modes (--approx ...): output-changing cross-step
    # caches (PERF.md "Opt-in approx modes"), reported as separate keys so
    # the headline stays exact.  ONE build (intervals are runtime scan
    # inputs) serves every point; the recommended operating point
    # step-extrap:3 (SSIM >= 0.99 on all three reference schedules —
    # PERF.md per-workload tables) runs first and feeds
    # approx_best_vs_baseline; the other points are lower-priority sections.
    fns_approx = None

    def sec_approx_step3():
        nonlocal fns_approx
        fns_approx = make_sampling_fns(
            unet_cfg, sched_cfg, infer_cfg, dtype=dtype,
            uncond_interval=2, guidance_interval=2, step_interval=2,
        )
        t0 = time.time()
        out = fns_approx.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            uncond_refresh=1, guidance_refresh=1, step_refresh=3,
            step_extrap_w=1.0,
        )
        jax.block_until_ready(fetch_video(out))
        log(f"approx compile+first run (step-extrap:3): {time.time()-t0:.0f}s")
        t0 = time.time()
        out = fns_approx.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            uncond_refresh=1, guidance_refresh=1, step_refresh=3,
            step_extrap_w=1.0,
        )
        fetch_video(out)
        step3_elapsed = time.time() - t0
        log(f"approx (step-extrap:3) sampling: {step3_elapsed:.2f}s/video")
        stage(
            approx_step3_extrap_sec=round(step3_elapsed, 3),
            approx_best_vs_baseline=round(TARGET_SECONDS / step3_elapsed, 3),
        )

    guard("approx_step3", 60, sec_approx_step3)

    def build_controlnet(cn_file, cond_ch, cond_hw, seed):
        """Shared i2v-section setup: a shipped sparsectrl YAML -> (model,
        random params).  ``cond_hw``/``cond_ch`` set the conditioning
        geometry (latent 4ch at latent res vs pixel 3ch at image res);
        SMOKE shrinks the motion-module kwargs to the tiny topology (the
        production YAMLs assume 32 norm groups / 8 heads)."""
        from motionclone_tpu.config import load_yaml
        from motionclone_tpu.models.sparse_controlnet import (
            SparseControlNetConfig,
            SparseControlNetModel,
        )

        cn_yaml = load_yaml(f"/root/repo/configs/sparsectrl/{cn_file}")
        cn_cfg = SparseControlNetConfig.from_yaml_dict(
            cn_yaml.get("controlnet_additional_kwargs", {}), unet_cfg
        )
        if SMOKE:
            import dataclasses

            cn_cfg = dataclasses.replace(
                cn_cfg,
                motion_module=dataclasses.replace(
                    cn_cfg.motion_module, num_attention_heads=2, norm_num_groups=4
                ),
            )
        cn_model = SparseControlNetModel(cfg=cn_cfg, dtype=dtype)
        t0 = time.time()
        cn_params = jax.jit(
            lambda: cn_model.init(
                jax.random.PRNGKey(seed),
                sample0,
                jnp.array([1]),
                ctx0,
                jnp.zeros((1, F, cond_hw, cond_hw, cond_ch), dtype),
                jnp.zeros((1, F, cond_hw, cond_hw, 1), dtype),
            )
        )()
        jax.block_until_ready(cn_params)
        log(
            f"{cn_file} controlnet params initialized in {time.time()-t0:.0f}s"
        )
        return cn_model, cn_params

    # ---- i2v (configs/i2v_rgb.yaml: 100 steps / 40 guided, SparseCtrl
    # latent conditioning — one controlnet forward per CFG half per step).
    # Random controlnet weights from the shipped production config; this
    # also demonstrates the guided i2v step (controlnet + grad-through-UNet)
    # fits the 15.75 GB HBM with the grad-safe attention impl.
    def sec_i2v():
        from motionclone_tpu.models.sparse_controlnet import scatter_condition
        from motionclone_tpu.pipeline.motionclone import make_controlnet_apply

        i2v_cfg = InferenceConfig(
            inference_steps=100,
            guidance_steps=40,
            guidance_fraction=0.3,
            warm_up_steps=10,
            cool_up_steps=10,
            motion_guidance_weight=2000.0,
            motion_guidance_blocks=GUIDANCE_BLOCKS,
            width=size,
            height=size,
            video_length=n_frames,
            cfg_scale=7.5,
        )
        cn_model, cn_params = build_controlnet(
            "latent_condition.yaml", cond_ch=4, cond_hw=H, seed=2
        )
        fns_i2v = make_sampling_fns(
            unet_cfg, sched_cfg, i2v_cfg, dtype=dtype,
            controlnet_apply=make_controlnet_apply(cn_model),
        )
        cond_img = jnp.asarray(
            rng.normal(size=(B, 1, H, W, 4)), jnp.float32
        ).astype(dtype)
        cn_cond_t, cn_mask = scatter_condition(cond_img, (0,), F)
        cn_cond = (cn_cond_t, cn_mask.astype(dtype), 1.0)
        t0 = time.time()
        out = fns_i2v.sample(
            params, rand_latents(), uncond, cond, rep, cn_params, cn_cond,
            chunk_steps=60,
        )
        jax.block_until_ready(fetch_video(out))
        log(f"i2v compile+first run: {time.time()-t0:.0f}s")
        t0 = time.time()
        out = fns_i2v.sample(
            params, rand_latents(), uncond, cond, rep, cn_params, cn_cond,
            chunk_steps=60,
        )
        fetch_video(out)
        i2v_elapsed = time.time() - t0
        log(f"i2v sampling: {i2v_elapsed:.2f}s/video (100 steps + controlnet)")
        stage(i2v_sec_per_video=round(i2v_elapsed, 3))

        # i2v per-phase: dispatch each phase chunk alone with fresh latents
        if SMOKE or fits("i2v_phase_timing", 70):
            gi_xs, vi_xs = fns_i2v.phase_xs
            t0 = time.time()
            lat_g = fns_i2v.guided_chunk(
                params, rand_latents(), uncond, cond, rep, cn_params,
                cn_cond, gi_xs,
            )
            float(lat_g.ravel()[0])
            i2v_guided_ms = (time.time() - t0) * 1000.0 / len(gi_xs[0])
            t0 = time.time()
            lat_v = fns_i2v.vanilla_chunk(
                params, lat_g, uncond, cond, rep, cn_params, cn_cond, vi_xs
            )
            float(lat_v.ravel()[0])
            i2v_vanilla_ms = (time.time() - t0) * 1000.0 / len(vi_xs[0])
            log(
                f"i2v phase timing: guided {i2v_guided_ms:.1f} ms/step x "
                f"{len(gi_xs[0])}, vanilla {i2v_vanilla_ms:.1f} ms/step x "
                f"{len(vi_xs[0])}"
            )
            stage(
                i2v_guided_ms_per_step=round(i2v_guided_ms, 1),
                i2v_vanilla_ms_per_step=round(i2v_vanilla_ms, 1),
            )

    guard("i2v", 190, sec_i2v)

    # ---- t2v_object (configs/t2v_object.yaml: 300 steps / 180 guided).
    # Same step math and shapes as t2v_camera — chunk_steps=60 tiles both
    # phases exactly (180 = 3x60, 120 = 2x60), so this compiles two fresh
    # chunk lengths and then reuses them across all dispatches.
    def sec_t2v_object():
        obj_cfg = InferenceConfig(
            inference_steps=300,
            guidance_steps=180,
            guidance_fraction=0.4,
            warm_up_steps=10,
            cool_up_steps=10,
            motion_guidance_weight=2000.0,
            motion_guidance_blocks=GUIDANCE_BLOCKS,
            width=size,
            height=size,
            video_length=n_frames,
            cfg_scale=7.5,
        )
        fns_obj = make_sampling_fns(unet_cfg, sched_cfg, obj_cfg, dtype=dtype)
        t0 = time.time()
        out = fns_obj.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            chunk_steps=60,
        )
        jax.block_until_ready(fetch_video(out))
        first = time.time() - t0
        log(f"t2v_object compile+first run: {first:.0f}s")
        # the second (timed) run re-dispatches the same warm executables; if
        # the budget cannot absorb it, the first run is staged under its OWN
        # key — on a cold compile cache it overstates the warm per-video
        # time several-fold, so it must not be readable as the real number.
        # (est 115 = measured warm timed run 119.8 s; the staged-JSON +
        # SIGTERM emission makes a small overrun harmless, unlike r03)
        if SMOKE or fits("t2v_object_timed", 115):
            t0 = time.time()
            out = fns_obj.sample(
                params, rand_latents(), uncond, cond, rep, None, None,
                chunk_steps=60,
            )
            fetch_video(out)
            obj_elapsed = time.time() - t0
            log(f"t2v_object sampling: {obj_elapsed:.2f}s/video (300 steps)")
            stage(t2v_object_sec_per_video=round(obj_elapsed, 3))
        else:
            log(
                f"t2v_object first run only (includes executable load/"
                f"compile): {first:.2f}s"
            )
            stage(t2v_object_first_run_sec=round(first, 3))

    guard("t2v_object", 260, sec_t2v_object)

    # ---- i2v_sketch (configs/i2v_sketch.yaml: 200 steps / 120 guided,
    # guidance_fraction 0.4, SparseCtrl PIXEL-space scribble conditioning —
    # configs/sparsectrl/image_condition.yaml: 3-channel condition through
    # the full conv embedding stack, reference i2v_video_sample.py:54-59).
    # chunk_steps=40 tiles both phases exactly (120 = 3x40, 80 = 2x40), so
    # one guided + one vanilla executable serve the whole schedule.
    def sec_i2v_sketch():
        from motionclone_tpu.models.sparse_controlnet import scatter_condition
        from motionclone_tpu.pipeline.motionclone import make_controlnet_apply

        sk_cfg = InferenceConfig(
            inference_steps=200,
            guidance_steps=120,
            guidance_fraction=0.4,
            warm_up_steps=10,
            cool_up_steps=10,
            motion_guidance_weight=2000.0,
            motion_guidance_blocks=GUIDANCE_BLOCKS,
            width=size,
            height=size,
            video_length=n_frames,
            cfg_scale=7.5,
        )
        # pixel conditioning enters at full image resolution (the conv
        # embedding stack downsamples it back to latent resolution)
        cn_model, cn_params = build_controlnet(
            "image_condition.yaml", cond_ch=3, cond_hw=size, seed=3
        )
        fns_sk = make_sampling_fns(
            unet_cfg, sched_cfg, sk_cfg, dtype=dtype,
            controlnet_apply=make_controlnet_apply(cn_model),
        )
        sketch01 = jnp.asarray(
            rng.uniform(0.0, 1.0, size=(B, 1, size, size, 3)), jnp.float32
        ).astype(dtype)
        cn_cond_t, cn_mask = scatter_condition(sketch01, (0,), F)
        cn_cond = (cn_cond_t, cn_mask.astype(dtype), 1.0)
        t0 = time.time()
        out = fns_sk.sample(
            params, rand_latents(), uncond, cond, rep, cn_params, cn_cond,
            chunk_steps=40,
        )
        jax.block_until_ready(fetch_video(out))
        first = time.time() - t0
        log(f"i2v_sketch compile+first run: {first:.0f}s")
        if SMOKE or fits("i2v_sketch_timed", 120):
            t0 = time.time()
            out = fns_sk.sample(
                params, rand_latents(), uncond, cond, rep, cn_params,
                cn_cond, chunk_steps=40,
            )
            fetch_video(out)
            sk_elapsed = time.time() - t0
            log(f"i2v_sketch sampling: {sk_elapsed:.2f}s/video (200 steps)")
            stage(i2v_sketch_sec_per_video=round(sk_elapsed, 3))
        else:
            log(
                f"i2v_sketch first run only (includes executable load/"
                f"compile): {first:.2f}s"
            )
            stage(i2v_sketch_first_run_sec=round(first, 3))

    guard("i2v_sketch", 240, sec_i2v_sketch)

    # ---- extra approx points (lowest priority; PERF.md sweep context):
    # the r2 finer-cache recommendation, step-extrap:2, and the composition
    def sec_approx_extra():
        t0 = time.time()
        out = fns_approx.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            uncond_refresh=5, guidance_refresh=2, uncond_extrap_w=1.0,
            step_refresh=1,
        )
        fetch_video(out)
        approx_elapsed = time.time() - t0
        log(f"approx (K_u=5 extrap, K_g=2) sampling: {approx_elapsed:.2f}s/video")
        stage(
            approx_uncond5_extrap_guidance2_sec=round(approx_elapsed, 3),
            approx_vs_baseline=round(TARGET_SECONDS / approx_elapsed, 3),
        )
        t0 = time.time()
        out = fns_approx.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            uncond_refresh=1, guidance_refresh=1, step_refresh=2,
            step_extrap_w=1.0,
        )
        fetch_video(out)
        step2_elapsed = time.time() - t0
        log(f"approx (step-extrap:2) sampling: {step2_elapsed:.2f}s/video")
        stage(approx_step2_extrap_sec=round(step2_elapsed, 3))
        t0 = time.time()
        out = fns_approx.sample(
            params, rand_latents(), uncond, cond, rep, None, None,
            uncond_refresh=5, guidance_refresh=2, uncond_extrap_w=1.0,
            step_refresh=2, step_extrap_w=1.0,
        )
        fetch_video(out)
        composed_elapsed = time.time() - t0
        log(
            f"approx (K_u=5 extrap, K_g=2, step-extrap:2) sampling: "
            f"{composed_elapsed:.2f}s/video"
        )
        stage(
            approx_composed_step2_sec=round(composed_elapsed, 3),
            approx_composed_vs_baseline=round(
                TARGET_SECONDS / composed_elapsed, 3
            ),
        )

    if fns_approx is not None:
        guard("approx_extra_points", 90, sec_approx_extra)

    log(f"done in {time.time()-START:.0f}s; emitting JSON")
    _emit()


if __name__ == "__main__":
    main()
