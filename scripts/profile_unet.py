"""Op-level profile of one UNet3D forward (and optionally the guided
fwd+bwd) on the real TPU.

Runs a few iterations under jax.profiler.trace and aggregates device-event
durations from the raw vm.trace.json.gz (the xprof op_profile converter
reports zero times through the axon tunnel; the raw events are correct —
see PERF.md methodology).

Usage: python scripts/profile_unet.py [plain|guided|vanilla2] [out_dir]
"""

import collections
import glob
import gzip
import json
import os
import sys

import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

from motionclone_tpu.config import InferenceConfig, NoiseScheduleConfig, UNet3DConfig
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.diffusion.guidance import motion_guidance_loss, sparsify_top1

MODE = sys.argv[1] if len(sys.argv) > 1 else "plain"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prof_unet"

unet_cfg = UNet3DConfig()
infer_cfg = InferenceConfig(
    inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
    motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
    video_length=16,
)

dtype = jnp.bfloat16
B = 2 if MODE == "vanilla2" else 1
lat = jnp.zeros((B, 16, 64, 64, 4), dtype)
emb = jnp.zeros((B, 77, 768), dtype)
t = jnp.asarray(400)

if MODE == "guided":
    unet = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=("up_blocks.1",),
        attention_impl="grad-safe", post_guidance_cut=1,
        post_guidance_impl="fused", dtype=dtype,
    )
else:
    unet = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=(),
        attention_impl="fused" if jax.default_backend() == "tpu" else "auto",
        dtype=dtype,
    )

rng = jax.random.PRNGKey(0)
# params are shape-independent of H/W: init at 8x8 latents for speed
lat_init = jnp.zeros((1, 16, 8, 8, 4), dtype)
emb_init = jnp.zeros((1, 77, 768), dtype)
params = unet.init(rng, lat_init, t, emb_init)
print("params initialized", flush=True)

if MODE == "guided":
    gunet = unet

    @jax.jit
    def _probs0(params, latents, tt):
        _, probs = gunet.apply(params, latents, tt, emb)
        return {k: sparsify_top1(p) for k, p in probs.items()}

    rep = jax.tree_util.tree_map(
        jax.block_until_ready, _probs0(params, lat, t)
    )

    def loss_fn(latents, params, tt):
        pred, probs = gunet.apply(params, latents, tt, emb)
        return 2000.0 * motion_guidance_loss(probs, rep), pred

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(params, latents, tt):
        (loss, pred), g = grad_fn(latents, params, tt)
        return pred + g  # consume both
else:
    @jax.jit
    def step(params, latents, tt):
        pred, _ = unet.apply(params, latents, tt, emb)
        return pred

# compile
out = step(params, lat, t)
jax.block_until_ready(out)
print("compiled", flush=True)

N = 6
with jax.profiler.trace(OUT):
    x = lat
    for i in range(N):
        # vary input so the tunnel doesn't dedupe dispatches
        x = step(params, x + jnp.float32(i).astype(dtype) * 1e-6, t)
    jax.block_until_ready(x)

# ---- parse trace ----
paths = sorted(glob.glob(os.path.join(OUT, "plugins/profile/*/*.trace.json.gz")))
assert paths, f"no trace under {OUT}"
with gzip.open(paths[-1], "rt") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find device-side track pids (TPU core tracks contain XLA op events)
pid_names = {}
for e in events:
    if e.get("ph") == "M" and e.get("name") == "process_name":
        pid_names[e["pid"]] = e["args"].get("name", "")

durs = collections.Counter()
counts = collections.Counter()
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    pname = pid_names.get(e.get("pid"), "")
    if "TPU" not in pname and "/device" not in pname.lower():
        continue
    tid_ok = True
    name = e.get("name", "")
    d = e.get("dur", 0) / 1e3  # us -> ms
    durs[name] += d
    counts[name] += 1
    total += d

print(f"\ntotal device time over {N} iters: {total:.1f} ms  ({total/N:.1f} ms/iter)")
print(f"{'ms/iter':>9}  {'count':>6}  op")
for name, d in durs.most_common(48):
    print(f"{d/N:9.3f}  {counts[name]:6d}  {name[:110]}")
