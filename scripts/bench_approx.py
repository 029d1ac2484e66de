"""Benchmark the opt-in --approx uncond-cache mode (separate metric line).

Same workload as bench.py (t2v_camera 512x512x16f, 100 steps / 50 guided,
random bf16 weights) but with the cross-step caches enabled: the uncond
cache (refresh the unconditional forward every K_u steps) and the
guidance cache (refresh the motion-guidance grad every K_g guided steps).
The default bench.py path stays exact — this is the output-changing speed
mode VERDICT round 1 asked to bench separately.  The refresh intervals
are runtime scan inputs, so every (K_u, K_g) point shares ONE compiled
executable and the whole grid sweeps in-process.

    python scripts/bench_approx.py [KU:KG[:w[:KS[:ws]]] ...]
        (default: 3:1 5:1 3:2 5:2; KS = whole-step-cache interval —
         skip the full UNet on stale steps — ws its extrapolation weight)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

from motionclone_tpu.config import (  # noqa: E402
    InferenceConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel  # noqa: E402
from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402
from motionclone_tpu.pipeline.motionclone import make_sampling_fns  # noqa: E402

def _parse(a):
    parts = a.split(":")
    ku = int(parts[0])
    kg = int(parts[1]) if len(parts) > 1 else 1
    w = float(parts[2]) if len(parts) > 2 else 0.0
    ks = int(parts[3]) if len(parts) > 3 else 1
    ws = float(parts[4]) if len(parts) > 4 else 0.0
    return ku, kg, w, ks, ws


KS = [_parse(a) for a in sys.argv[1:]] or [
    (3, 1, 0.0, 1, 0.0), (5, 1, 0.0, 1, 0.0),
    (3, 2, 0.0, 1, 0.0), (5, 2, 0.0, 1, 0.0),
]
TARGET_SECONDS = 30.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    unet_cfg = UNet3DConfig()
    infer_cfg = InferenceConfig(
        inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
        warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
        motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
        video_length=16, cfg_scale=7.5,
    )
    dtype = jnp.bfloat16
    B, F = 1, infer_cfg.video_length
    H = W = infer_cfg.height // 8

    log(f"devices: {jax.devices()}; (K_uncond, K_guidance) sweep {KS}")
    model = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=("up_blocks.1",), dtype=dtype
    )
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, F, H, W, 4), dtype),
        jnp.array([1]), jnp.zeros((B, 77, 768), dtype)))()
    jax.block_until_ready(params)

    vae = AutoencoderKL(cfg=VAEConfig(), dtype=dtype)
    vae_params = jax.jit(lambda: vae.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 1, 64, 64, 3), dtype)))()

    def _decode_uint8(p, z):
        video = vae.apply(p, z, method=vae.decode)
        video01 = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        return jnp.round(video01 * 255.0).astype(jnp.uint8)

    decode = jax.jit(_decode_uint8)
    # intervals > 1 select the approx executables; the actual refresh
    # intervals are per-dispatch runtime inputs (uncond_refresh /
    # guidance_refresh below)
    fns = make_sampling_fns(
        unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype,
        uncond_interval=2, guidance_interval=2, step_interval=2,
    )

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)
    uncond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
    cond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
    s_hw = 16 * 16
    rep = {}
    for m in range(3):
        for a in range(2):
            name = (f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                    f".transformer_blocks.0.attention_blocks.{a}")
            rep[name] = (
                jnp.asarray(rng.uniform(0.2, 0.9, size=(B, s_hw, 8, F, 1)),
                            jnp.float32),
                jnp.asarray(rng.integers(0, F, size=(B, s_hw, 8, F, 1)),
                            np.uint8),
            )

    t0 = time.time()
    ku0, kg0, w0, ks0, ws0 = KS[0]
    out = fns.sample(params, latents, uncond, cond, rep, None, None,
                     uncond_refresh=ku0, guidance_refresh=kg0,
                     uncond_extrap_w=w0,
                     step_refresh=ks0, step_extrap_w=ws0)
    frames = decode(vae_params, out.astype(dtype))
    jax.block_until_ready(frames)
    log(f"compile+first run: {time.time()-t0:.0f}s")

    for ku, kg, w, ks, ws in KS:
        latents2 = jnp.asarray(
            rng.normal(size=(B, F, H, W, 4)), jnp.float32
        ).astype(dtype)
        t0 = time.time()
        out = fns.sample(params, latents2, uncond, cond, rep, None, None,
                         uncond_refresh=ku, guidance_refresh=kg,
                         uncond_extrap_w=w,
                         step_refresh=ks, step_extrap_w=ws)
        frames = decode(vae_params, out.astype(dtype))
        np.asarray(frames)
        elapsed = time.time() - t0
        tag = "_extrap" if w else ""
        if ks > 1:
            tag += f"_step{ks}" + ("x" if ws else "")
        log(f"approx K_u={ku} K_g={kg} w={w} K_s={ks} w_s={ws} "
            f"sampling: {elapsed:.2f}s/video")
        print(json.dumps({
            "metric": (
                f"sec_per_video_t2v_camera_512x512x16f_approx_"
                f"uncond{ku}_guidance{kg}{tag}"
            ),
            "value": round(elapsed, 3),
            "unit": "s",
            "vs_baseline": round(TARGET_SECONDS / elapsed, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
