"""Dump the optimized HLO of the plain UNet forward and print the named
fusions (so trace op names can be mapped back to model ops).

Usage: python scripts/dump_hlo.py [names...]
"""

import os
import sys

import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

from motionclone_tpu.config import UNet3DConfig
from motionclone_tpu.models.unet3d import UNet3DConditionModel

dtype = jnp.bfloat16
lat = jnp.zeros((1, 16, 64, 64, 4), dtype)
emb = jnp.zeros((1, 77, 768), dtype)
t = jnp.asarray(400)

unet = UNet3DConditionModel(
    cfg=UNet3DConfig(), guidance_blocks=(),
    attention_impl="fused" if jax.default_backend() == "tpu" else "auto",
    dtype=dtype,
)
rng = jax.random.PRNGKey(0)
lat_init = jnp.zeros((1, 16, 8, 8, 4), dtype)
params = unet.init(rng, lat_init, t, emb)


@jax.jit
def step(params, latents, tt):
    pred, _ = unet.apply(params, latents, tt, emb)
    return pred


lowered = step.lower(params, lat, t)
compiled = lowered.compile()
txt = compiled.as_text()
with open("/tmp/unet_fwd.hlo", "w") as f:
    f.write(txt)
print(f"HLO written: {len(txt)} bytes", flush=True)

names = sys.argv[1:]
for name in names:
    lines = [l for l in txt.splitlines() if f" {name} = " in l]
    for l in lines:
        print(l[:400])
        print("---")
