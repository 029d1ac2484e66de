"""Probe: is the CFG-pair guided step worth adopting on ONE chip?

PERF.md's guided-step attribution (452.7 ms/step = uncond fused fwd 159.2
+ cond grad fwd 167.5 + bwd 119.4) assumes the serial form is optimal
single-chip; the pair form (``guided_step_pair``,
pipeline/motionclone.py — batch-2 [uncond, cond] fwd+bwd, built for
splitting over a mesh's ``cfg`` axis) had never been TIMED single-chip.
Arithmetic says it should lose — the batch-2 backward runs the uncond
half's cotangent-zero gradient as wasted FLOPs (~+119 ms x ~0.8 batch
amortization) against saving one 159 ms uncond forward's fixed costs —
but the floor accounting should rest on a measurement, not a derivation.

This probe times both guided-step forms on the real chip over a 10-step
chunk (same compiled machinery as the production sampler; fresh latents
per dispatch so the tunnel cannot dedupe) at the t2v_camera shape
(512x512x16f).  A pair-form RESOURCE_EXHAUSTED is itself a finding: the
batch-2 backward's activation set may simply not fit 15.75 GB HBM.

    python scripts/probe_cfg_pair.py
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
from motionclone_tpu.parallel.mesh import (  # noqa: E402
    cfg_pair_sharding,
    make_mesh_2d,
)
from motionclone_tpu.pipeline.motionclone import make_sampling_fns  # noqa: E402

GUIDANCE_BLOCKS = ("up_blocks.1",)
CHUNK = 10


def slice_xs(xs, n):
    return jax.tree_util.tree_map(lambda a: a[:n], xs)


def main():
    dtype = jnp.bfloat16
    print(f"devices: {jax.devices()}", flush=True)
    unet_cfg = UNet3DConfig()
    infer_cfg = InferenceConfig(
        inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
        warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
        motion_guidance_blocks=GUIDANCE_BLOCKS, width=512, height=512,
        video_length=16, cfg_scale=7.5,
    )
    B, F = 1, 16
    H = W = 64
    model = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=GUIDANCE_BLOCKS, dtype=dtype
    )
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((B, F, H, W, 4), dtype),
        jnp.array([1]), jnp.zeros((B, 77, 768), dtype)))()
    jax.block_until_ready(params)
    print("params ready", flush=True)

    rng = np.random.default_rng(0)

    def rand_latents():
        return jnp.asarray(
            rng.normal(size=(B, F, H, W, 4)), jnp.float32
        ).astype(dtype)

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

    def time_guided(fns, label):
        g_xs, _ = fns.phase_xs
        xs = slice_xs(g_xs, CHUNK)
        t0 = time.time()
        lat = fns.guided_chunk(
            params, rand_latents(), uncond, cond, rep, None, None, xs
        )
        float(lat.ravel()[0])
        print(f"  {label}: compile+first {time.time()-t0:.0f}s", flush=True)
        t0 = time.time()
        lat = fns.guided_chunk(
            params, rand_latents(), uncond, cond, rep, None, None, xs
        )
        float(lat.ravel()[0])
        ms = (time.time() - t0) * 1000.0 / CHUNK
        print(f"  {label}: {ms:.1f} ms/guided step (x{CHUNK})", flush=True)
        return ms

    fns_serial = make_sampling_fns(
        unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype
    )
    ms_serial = time_guided(fns_serial, "serial (uncond fwd + cond fwd/bwd)")
    del fns_serial

    # pair form on one chip: a trivial (data=1, cfg=1) mesh makes
    # make_sampling_fns select guided_step_pair with no-op constraints
    mesh = make_mesh_2d(1, 1)
    fns_pair = make_sampling_fns(
        unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype,
        cfg_pair_sharding=cfg_pair_sharding(mesh),
    )
    try:
        ms_pair = time_guided(fns_pair, "pair (batch-2 fwd+bwd)")
        verdict = (
            "ADOPT pair single-chip" if ms_pair < ms_serial
            else "serial stands (pair slower, as derived)"
        )
        print(
            f"serial {ms_serial:.1f} ms vs pair {ms_pair:.1f} ms -> {verdict}",
            flush=True,
        )
    except Exception as e:  # noqa: BLE001 — OOM is a finding, not a crash
        print(
            f"pair form failed: {type(e).__name__}: {str(e)[:300]}\n"
            f"(RESOURCE_EXHAUSTED here means the batch-2 backward does not "
            f"fit 15.75 GB HBM single-chip — serial stands)",
            flush=True,
        )


if __name__ == "__main__":
    main()
