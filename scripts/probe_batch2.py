"""Adversarial probe: does batch-2 (the vanilla CFG pair) leave speed on
the table vs 2x batch-1?

PERF.md claims the vanilla step (batch-2 fused forward) is exactly 2x the
batch-1 forward — i.e. the model is compute/layout-bound and a
batch-2-specialized kernel has nothing to win.  This probe checks that
claim at both granularities on the real chip:

- full plain UNet forward, B=1 vs B=2 (in-graph lax.scan amortization,
  varying inputs so the tunnel cannot dedupe dispatches);
- the fused spatial-transformer Pallas kernel alone at 64x64 (S=4096,
  C=320), BF=16 vs BF=32 — the largest single cost in the forward.

If either ratio lands meaningfully under 2.0 there is batch headroom and a
pair-specialized kernel is worth building; at ~2.0 the floor claim stands.

    python scripts/probe_batch2.py
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

from motionclone_tpu.config import UNet3DConfig  # noqa: E402
from motionclone_tpu.models.unet3d import UNet3DConditionModel  # noqa: E402

STEPS = 20


def timed_scan(fn, params, x, steps=STEPS):
    """Device seconds per fn(params, x) application, amortized in one scan.

    ``params`` must be a jit ARGUMENT (not a closure capture): closed-over
    arrays are baked into the HLO as constants, and 5 GB of weight
    constants sends XLA's constant folding off a cliff (>25 min compiles).

    The timed dispatch gets a FRESH random buffer: a bf16 ``x * 1.000001``
    rounds back bit-identical (bf16 spacing ~0.4%), which would make the
    timed call eligible for the tunnel's identical-dispatch dedupe and put
    the multiply's own dispatch inside the timed window.
    """

    @jax.jit
    def run(params, x):
        def body(c, _):
            y = fn(params, c)
            # feed a hash of the output back so iterations chain (no LICM)
            return c * (1.0 + 1e-6 * jnp.tanh(jnp.mean(y).astype(c.dtype))), ()

        c, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.mean(c)

    r = run(params, x)
    float(r)  # compile + sync through the tunnel
    x2 = jnp.asarray(
        np.random.default_rng(1234).normal(size=x.shape), jnp.float32
    ).astype(x.dtype)
    t0 = time.time()
    r = run(params, x2)
    float(r)
    return (time.time() - t0) / steps


def main():
    dtype = jnp.bfloat16
    F, H, W = 16, 64, 64
    print(f"devices: {jax.devices()}", flush=True)

    unet = UNet3DConditionModel(
        cfg=UNet3DConfig(), guidance_blocks=(),
        attention_impl="fused" if jax.default_backend() == "tpu" else "auto",
        dtype=dtype,
    )
    emb1 = jnp.zeros((1, 77, 768), dtype)
    emb2 = jnp.zeros((2, 77, 768), dtype)
    t = jnp.asarray(400)
    params = jax.jit(lambda: unet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, F, 8, 8, 4), dtype), t, emb1))()
    jax.block_until_ready(params)
    print("params ready", flush=True)

    rng = np.random.default_rng(0)
    lat1 = jnp.asarray(rng.normal(size=(1, F, H, W, 4)), jnp.float32).astype(dtype)
    lat2 = jnp.asarray(rng.normal(size=(2, F, H, W, 4)), jnp.float32).astype(dtype)

    def fwd1(p, lat):
        pred, _ = unet.apply(p, lat, t, emb1)
        return pred

    def fwd2(p, lat):
        pred, _ = unet.apply(p, lat, t, emb2)
        return pred

    t1 = timed_scan(fwd1, params, lat1)
    t2 = timed_scan(fwd2, params, lat2)
    print(f"UNet fwd: B=1 {t1*1e3:.1f} ms, B=2 {t2*1e3:.1f} ms, "
          f"ratio {t2/t1:.3f} (2.0 = no batch win)", flush=True)

    # fused spatial transformer module alone at the dominant shape
    # (64x64 latents, C=320, S=4096 — the largest single forward cost)
    from motionclone_tpu.models.attention import Transformer3DModel

    C, heads = 320, 8
    tr = Transformer3DModel(
        heads=heads, dim_head=C // heads, num_layers=1,
        cross_attention_dim=768, norm_num_groups=32,
        attention_impl="fused" if jax.default_backend() == "tpu" else "auto",
        dtype=dtype,
    )
    x1 = jnp.asarray(rng.normal(size=(1, F, H, W, C)), jnp.float32).astype(dtype)
    x2 = jnp.asarray(rng.normal(size=(2, F, H, W, C)), jnp.float32).astype(dtype)
    tp = tr.init(jax.random.PRNGKey(1), x1, emb1)

    k1 = timed_scan(lambda p, x: tr.apply(p, x, emb1), tp, x1)
    k2 = timed_scan(lambda p, x: tr.apply(p, x, emb2), tp, x2)
    print(f"fused 64x64 transformer: B=1 {k1*1e3:.2f} ms, B=2 {k2*1e3:.2f} ms, "
          f"ratio {k2/k1:.3f} (the kernel grid is (BF x S-tiles): batch only "
          f"scales the grid, so ~2.0 means MXU-floor-bound, no pair headroom)",
          flush=True)


if __name__ == "__main__":
    main()
