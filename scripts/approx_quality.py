"""Quantify what the opt-in --approx caches change: exact vs approx outputs.

The cross-step caches (uncond-cache:K_u, guidance-cache:K_g) are
output-changing by construction — this script measures by how much, on the
bench workload (t2v_camera 512x512x16f, random bf16 weights; with real
checkpoints the same command reports the production deviation).  Both
trajectories run through the SAME compiled approx executable (refresh
intervals are runtime scan inputs; refresh=1 refreshes every step, i.e.
exact math), so the comparison isolates the caching itself, not
executable-to-executable numerics.

Reported per (K_u, K_g, w, K_s, w_s) point: relative L2 error of the
final latents, PSNR and SSIM of the decoded uint8 frames vs the exact
run — one JSON line per point.

    python scripts/approx_quality.py [--workload W] [--time]
        [KU:KG[:w[:KS[:ws]]] ...]
        (default points: 3:1 5:2; KS = whole-step-cache interval, ws its
         extrapolation weight; W in {t2v_camera, t2v_object, i2v},
         default t2v_camera)

``--time`` additionally measures each point's wall time per video
(a second dispatch with fresh latents — the tunnel dedupes identical
dispatches — through the same approx executable, decode+fetch included),
reported as ``sec_per_video`` in the JSON line; the exact point gets one
too.  Run on an idle machine for representative numbers.

``--workload t2v_object`` runs the 300-step / 180-guided schedule
(configs/t2v_object.yaml — cache drift over 3x the guided steps);
``--workload i2v`` runs the 100/40 SparseCtrl schedule
(configs/i2v_rgb.yaml) with a per-step controlnet forward;
``--workload i2v_sketch`` the 200/120 schedule with PIXEL-space scribble
conditioning (configs/i2v_sketch.yaml + sparsectrl/image_condition.yaml —
the fourth flagship workload, 3-channel condition through the full conv
embedding stack).
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
from motionclone_tpu.utils.metrics import psnr, ssim  # noqa: E402


def _parse(a):
    parts = a.split(":")
    ku = int(parts[0])
    kg = int(parts[1]) if len(parts) > 1 else 1
    w = float(parts[2]) if len(parts) > 2 else 0.0
    ks = int(parts[3]) if len(parts) > 3 else 1
    ws = float(parts[4]) if len(parts) > 4 else 0.0
    return ku, kg, w, ks, ws


_args = sys.argv[1:]
WORKLOAD = "t2v_camera"
if "--workload" in _args:
    i = _args.index("--workload")
    WORKLOAD = _args[i + 1]
    _args = _args[:i] + _args[i + 2:]
TIME_POINTS = "--time" in _args
if TIME_POINTS:
    _args.remove("--time")
KS = [_parse(a) for a in _args] or [(3, 1, 0.0, 1, 0.0), (5, 2, 0.0, 1, 0.0)]

# schedule knobs per shipped config (configs/<workload>.yaml)
SCHEDULES = {
    "t2v_camera": dict(inference_steps=100, guidance_steps=50,
                       guidance_fraction=0.3, chunk_steps=50),
    "t2v_object": dict(inference_steps=300, guidance_steps=180,
                       guidance_fraction=0.4, chunk_steps=60),
    "i2v": dict(inference_steps=100, guidance_steps=40,
                guidance_fraction=0.3, chunk_steps=60),
    # chunk_steps=40 tiles both phases exactly (120 = 3x40, 80 = 2x40)
    "i2v_sketch": dict(inference_steps=200, guidance_steps=120,
                       guidance_fraction=0.4, chunk_steps=40),
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    sched = SCHEDULES[WORKLOAD]
    chunk_steps = sched.pop("chunk_steps")
    unet_cfg = UNet3DConfig()
    infer_cfg = InferenceConfig(
        warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
        motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
        video_length=16, cfg_scale=7.5, **sched,
    )
    dtype = jnp.bfloat16
    B, F = 1, infer_cfg.video_length
    H = W = infer_cfg.height // 8

    log(f"devices: {jax.devices()}; workload {WORKLOAD}; "
        f"comparing exact vs approx {KS}")
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

    controlnet_apply, cn_params, cn_cond = None, None, None
    if WORKLOAD in ("i2v", "i2v_sketch"):
        from motionclone_tpu.config import load_yaml
        from motionclone_tpu.models.sparse_controlnet import (
            SparseControlNetConfig,
            SparseControlNetModel,
            scatter_condition,
        )
        from motionclone_tpu.pipeline.motionclone import make_controlnet_apply

        cn_file = (
            "latent_condition.yaml" if WORKLOAD == "i2v"
            else "image_condition.yaml"
        )
        cn_yaml = load_yaml(f"/root/repo/configs/sparsectrl/{cn_file}")
        cn_cfg = SparseControlNetConfig.from_yaml_dict(
            cn_yaml.get("controlnet_additional_kwargs", {}), unet_cfg
        )
        cn_model = SparseControlNetModel(cfg=cn_cfg, dtype=dtype)
        rng_cn = np.random.default_rng(7)
        if WORKLOAD == "i2v":
            # latent conditioning: 4-channel condition at latent resolution
            ch, chw = 4, H
            cond_img = jnp.asarray(
                rng_cn.normal(size=(B, 1, chw, chw, ch)), jnp.float32
            ).astype(dtype)
        else:
            # pixel conditioning: 3-channel scribble at image resolution,
            # downsampled back by the full conv embedding stack
            ch, chw = 3, infer_cfg.height
            cond_img = jnp.asarray(
                rng_cn.uniform(0.0, 1.0, size=(B, 1, chw, chw, ch)),
                jnp.float32,
            ).astype(dtype)
        cn_params = jax.jit(lambda: cn_model.init(
            jax.random.PRNGKey(2), jnp.zeros((B, F, H, W, 4), dtype),
            jnp.array([1]), jnp.zeros((B, 77, 768), dtype),
            jnp.zeros((B, F, chw, chw, ch), dtype),
            jnp.zeros((B, F, chw, chw, 1), dtype)))()
        jax.block_until_ready(cn_params)
        cn_cond_t, cn_mask = scatter_condition(cond_img, (0,), F)
        cn_cond = (cn_cond_t, cn_mask.astype(dtype), 1.0)
        controlnet_apply = make_controlnet_apply(cn_model)

    fns = make_sampling_fns(
        unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype,
        uncond_interval=2, guidance_interval=2, step_interval=2,
        controlnet_apply=controlnet_apply,
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

    def run(ku, kg, w=0.0, ks=1, ws=0.0, lat=None):
        out = fns.sample(params, latents if lat is None else lat, uncond,
                         cond, rep, cn_params,
                         cn_cond, chunk_steps=chunk_steps,
                         uncond_refresh=ku, guidance_refresh=kg,
                         uncond_extrap_w=w,
                         step_refresh=ks, step_extrap_w=ws)
        frames = np.asarray(decode(vae_params, out.astype(dtype)))
        return np.asarray(out, np.float32), frames

    def timed(ku, kg, w, ks, ws):
        """One timed dispatch with fresh latents (the tunnel dedupes
        identical dispatches), decode + full host fetch included."""
        lat = jnp.asarray(
            np.random.default_rng(int(time.time()) % 2**31).normal(
                size=(B, F, H, W, 4)
            ),
            jnp.float32,
        ).astype(dtype)
        t0 = time.time()
        run(ku, kg, w, ks, ws, lat=lat)
        return time.time() - t0

    t0 = time.time()
    lat_exact, vid_exact = run(1, 1)
    log(f"exact (refresh=1) run done in {time.time()-t0:.0f}s "
        f"(incl. any cold compile)")
    if TIME_POINTS:
        exact_s = timed(1, 1, 0.0, 1, 0.0)
        log(f"exact timed: {exact_s:.2f}s/video (through the approx "
            f"executable, refresh=1)")
        print(json.dumps({
            "metric": "approx_deviation_exact",
            "workload": WORKLOAD,
            "sec_per_video": round(exact_s, 2),
        }), flush=True)

    for ku, kg, w, ks, ws in KS:
        t0 = time.time()
        lat_a, vid_a = run(ku, kg, w, ks, ws)
        rel_l2 = float(
            np.linalg.norm(lat_a - lat_exact) / np.linalg.norm(lat_exact)
        )
        # per-frame metrics on the decoded uint8 clip, averaged
        fr_e = vid_exact.reshape(-1, *vid_exact.shape[-3:])
        fr_a = vid_a.reshape(-1, *vid_a.shape[-3:])
        ps = float(np.mean([min(psnr(a, b), 99.0) for a, b in zip(fr_a, fr_e)]))
        ss = float(np.mean([ssim(a, b) for a, b in zip(fr_a, fr_e)]))
        tag = "_extrap" if w else ""
        if ks > 1:
            tag += f"_step{ks}" + ("x" if ws else "")
        log(f"K_u={ku} K_g={kg} w={w} K_s={ks} w_s={ws}: rel_l2={rel_l2:.4f} "
            f"psnr={ps:.2f} ssim={ss:.4f} ({time.time()-t0:.0f}s)")
        rec = {
            "metric": f"approx_deviation_uncond{ku}_guidance{kg}{tag}",
            "workload": WORKLOAD,
            "latent_rel_l2": round(rel_l2, 5),
            "decoded_psnr_db": round(ps, 2),
            "decoded_ssim": round(ss, 4),
        }
        if TIME_POINTS:
            s = timed(ku, kg, w, ks, ws)
            log(f"  timed: {s:.2f}s/video")
            rec["sec_per_video"] = round(s, 2)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
