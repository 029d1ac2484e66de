"""Full-size UNet3D smoke + timing on the real TPU chip.

Random bf16 weights, 512x512x16f latents: times one plain CFG forward and
one guided (value_and_grad) step — the two step kinds of the sampling loop.
Run: python scripts/tpu_smoke.py [--impl flash|chunked|xla]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import (
    InferenceConfig,
    NoiseScheduleConfig,
    UNet3DConfig,
)
from motionclone_tpu.diffusion.guidance import motion_guidance_loss
from motionclone_tpu.models.unet3d import UNet3DConditionModel


def main(args):
    print("devices:", jax.devices())
    unet_cfg = UNet3DConfig()
    dtype = jnp.bfloat16
    guided = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=("up_blocks.1",),
        attention_impl=args.impl, dtype=dtype,
    )
    plain = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=(), attention_impl=args.impl, dtype=dtype
    )

    B, F, H, W = 1, 16, 64, 64
    sample = jnp.zeros((B, F, H, W, 4), dtype)
    ctx = jnp.zeros((B, 77, 768), dtype)

    t0 = time.time()
    params = jax.jit(
        lambda: guided.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    )()
    jax.block_until_ready(params)
    n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    print(f"init: {time.time()-t0:.1f}s, {n_params/1e6:.0f}M params")

    # plain batch-2 CFG forward (vanilla step shape)
    fwd = jax.jit(lambda p, x, t, c: plain.apply(p, x, t, c)[0])
    x2 = jnp.concatenate([sample, sample], axis=0)
    ctx2 = jnp.concatenate([ctx, ctx], axis=0)
    t0 = time.time()
    out = fwd(params, x2, jnp.array([500]), ctx2)
    out.block_until_ready()
    print(f"fwd batch2 compile+run: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        out = fwd(params, x2, jnp.array([500]), ctx2)
    out.block_until_ready()
    print(f"fwd batch2: {(time.time()-t0)/3*1000:.0f} ms")

    # guided step: uncond fwd + value_and_grad cond fwd
    rng = np.random.default_rng(0)
    rep = {}
    s_hw = 16 * 16
    for m in range(3):
        for a in range(2):
            name = (
                f"up_blocks.1.motion_modules.{m}.temporal_transformer"
                f".transformer_blocks.0.attention_blocks.{a}"
            )
            rep[name] = (
                jnp.asarray(
                    rng.uniform(0.2, 0.9, size=(B, s_hw, 8, F, 1)), jnp.float32
                ),
                jnp.asarray(
                    rng.integers(0, F, size=(B, s_hw, 8, F, 1)), jnp.uint8
                ),
            )

    def loss_fn(p, x, t, c):
        pred, probs = guided.apply(p, x, t, c)
        return 2000.0 * motion_guidance_loss(probs, rep), pred

    if args.remat:
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )
    grad_fn = jax.jit(jax.value_and_grad(loss_fn, argnums=1, has_aux=True))
    t0 = time.time()
    (loss, pred), g = grad_fn(params, sample, jnp.array([900]), ctx)
    jax.block_until_ready(g)
    print(f"guided grad compile+run: {time.time()-t0:.1f}s, loss={float(loss):.4f}")
    t0 = time.time()
    for _ in range(3):
        (loss, pred), g = grad_fn(params, sample, jnp.array([900]), ctx)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / 3
    print(f"guided grad: {dt*1000:.0f} ms")

    # projected sec/video for t2v_camera (50 guided + 50 vanilla)
    t0 = time.time()
    for _ in range(3):
        out = fwd(params, x2, jnp.array([500]), ctx2)
    out.block_until_ready()
    dt_v = (time.time() - t0) / 3
    proj = 50 * (dt + dt_v / 2 * 0 + dt_v * 0) + 50 * dt_v + 50 * dt_v  # see note
    # guided step = uncond fwd (batch1 ~ dt_v/2) + grad step (dt)
    guided_step = dt + dt_v / 2
    proj = 50 * guided_step + 50 * dt_v
    print(f"projected sampling time t2v_camera: {proj:.1f}s")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="flash")
    ap.add_argument("--remat", action="store_true")
    main(ap.parse_args())
