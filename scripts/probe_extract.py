"""Time the motion-representation extraction stage on the real chip.

Extraction (reference obtain_motion_representation,
motionclone_functions.py:26-82) is a separate, per-reference-video stage:
VAE-encode the 16 preprocessed frames, add noise at t=add_noise_step, one
TRUNCATED UNet forward (early exit after up_blocks.1), top-1 sparsify the
temporal-attention probs.  It is outside the <30 s sampling headline (the
reference also runs it as its own stage and persists the result;
SURVEY §5 checkpoint/resume) — this probe records its wall cost for the
PERF.md exact-path accounting.

Usage: python scripts/probe_extract.py   (idle machine; ~min cold compile)
"""

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


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    unet_cfg = UNet3DConfig()
    infer_cfg = InferenceConfig(
        inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
        warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
        motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
        video_length=16,
    )
    dtype = jnp.bfloat16
    B, F, H, W = 1, 16, 64, 64
    log(f"devices: {jax.devices()}")
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
    jax.block_until_ready(vae_params)

    def _encode(p, frames, key):
        from motionclone_tpu.models.vae import sample_latents

        mean, logvar = vae.apply(p, frames, method=vae.encode)
        return sample_latents(mean, logvar, key) * 0.18215

    encode = jax.jit(_encode)
    fns = make_sampling_fns(unet_cfg, NoiseScheduleConfig(), infer_cfg,
                            dtype=dtype)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, size=(B, F, 512, 512, 3)), jnp.float32
    ).astype(dtype)
    uncond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
    noise = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)

    # warm-up (compiles)
    t0 = time.time()
    lat = encode(vae_params, frames, jax.random.PRNGKey(2))
    jax.block_until_ready(lat)
    log(f"vae encode compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    rep = fns.extract(params, lat, noise, uncond, None, None)
    jax.block_until_ready(rep)
    log(f"extract compile+first: {time.time()-t0:.1f}s")

    # timed (fresh inputs so the tunnel cannot dedupe; fetch the rep)
    frames2 = jnp.asarray(
        rng.uniform(-1, 1, size=(B, F, 512, 512, 3)), jnp.float32
    ).astype(dtype)
    t0 = time.time()
    lat = encode(vae_params, frames2, jax.random.PRNGKey(3))
    rep = fns.extract(params, lat, noise, uncond, None, None)
    rep_np = jax.tree_util.tree_map(np.asarray, rep)
    total = time.time() - t0
    n = sum(v.size for v, _ in rep_np.values())
    log(f"extract stage: {total:.2f}s (encode 16x512^2 -> truncated fwd -> "
        f"top-1 rep fetch, {n} rep values)")
    import json

    print(json.dumps({
        "metric": "extract_stage_sec",
        "value": round(total, 3),
        "unit": "s",
    }))


if __name__ == "__main__":
    main()
