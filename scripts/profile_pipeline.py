"""In-graph profile of the pipeline's guided and vanilla scan chunks.

Usage: python scripts/profile_pipeline.py [guided|vanilla] [out_dir]
Traces one jitted chunk dispatch (chunk_len scan steps) with real shapes and
prints the per-step device time; parse details with scripts/trace_report.py.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

from motionclone_tpu.config import InferenceConfig, NoiseScheduleConfig, UNet3DConfig
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.pipeline.motionclone import make_sampling_fns

MODE = sys.argv[1] if len(sys.argv) > 1 else "guided"
OUT = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/prof_pipe_{MODE}"

unet_cfg = UNet3DConfig()
infer_cfg = InferenceConfig(
    inference_steps=100, guidance_steps=50, guidance_fraction=0.3,
    warm_up_steps=10, cool_up_steps=10, motion_guidance_weight=2000.0,
    motion_guidance_blocks=("up_blocks.1",), width=512, height=512,
    video_length=16, cfg_scale=7.5,
)
dtype = jnp.bfloat16
B, F, H, W = 1, 16, 64, 64

model = UNet3DConditionModel(cfg=unet_cfg, guidance_blocks=("up_blocks.1",), dtype=dtype)
params = jax.jit(lambda: model.init(
    jax.random.PRNGKey(0), jnp.zeros((B, F, 8, 8, 4), dtype), jnp.array([1]),
    jnp.zeros((B, 77, 768), dtype)))()
jax.block_until_ready(params)
print("params ready", flush=True)

fns = make_sampling_fns(unet_cfg, NoiseScheduleConfig(), infer_cfg, dtype=dtype)

rng = np.random.default_rng(0)
lat = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)
uncond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
cond = jnp.asarray(rng.normal(size=(B, 77, 768)), jnp.float32).astype(dtype)
s_hw = 16 * 16
rep = {}
for m in range(3):
    for a in range(2):
        name = (f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                f".transformer_blocks.0.attention_blocks.{a}")
        rep[name] = (
            jnp.asarray(rng.uniform(0.2, 0.9, size=(B, s_hw, 8, F, 1)), jnp.float32),
            jnp.asarray(rng.integers(0, F, size=(B, s_hw, 8, F, 1)), np.uint8),
        )

# access the internal chunk callables via the sample fn's closure is awkward;
# instead drive the public sample() with a tiny schedule: profile full sample
# with inference_steps reduced is a different compile.  Simplest: time the
# full sample once (cached compile) under the profiler and attribute by scan
# body names.
out = fns.sample(params, lat, uncond, cond, rep, None, None)
jax.block_until_ready(out)
print("compiled", flush=True)

lat2 = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32).astype(dtype)
with jax.profiler.trace(OUT):
    out = fns.sample(params, lat2, uncond, cond, rep, None, None)
    jax.block_until_ready(out)
print("traced to", OUT, flush=True)
