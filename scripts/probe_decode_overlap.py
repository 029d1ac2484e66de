"""Tune the decode/fetch overlap slice count on the real chip.

The sampling tail is: whole-clip VAE decode -> uint8 conversion on device ->
~12.6 MB host fetch over the slow tunnel link.  ``decode_latents`` /
bench.py's ``fetch_video`` pipeline this by decoding the clip in frame
slices dispatched back-to-back, so the host fetch of slice i overlaps
slice i+1's device execution.  More slices shrink the serial head
(first slice's decode) but add per-dispatch latency (~12-15 ms each).

Measures end-to-end decode+fetch wall time for n_chunks in
{1, 2, 4, 8, 16} on the production shape (16 frames, 512x512), varying
latents per iteration so the tunnel cannot dedupe dispatches.

Usage: python scripts/probe_decode_overlap.py
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

from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig  # noqa: E402

B, F, HW = 1, 16, 64
DTYPE = jnp.bfloat16
REPS = 3


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    vae = AutoencoderKL(cfg=VAEConfig(), dtype=DTYPE)
    vae_params = jax.jit(
        lambda: vae.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 1, 16, 16, 3), DTYPE)
        )
    )()
    jax.block_until_ready(vae_params)

    def _decode_uint8(p, z):
        video = vae.apply(p, z, method=vae.decode)
        video01 = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
        return jnp.round(video01 * 255.0).astype(jnp.uint8)

    decode = jax.jit(_decode_uint8)

    rng = np.random.default_rng(0)

    def fetch(z, n_chunks):
        parts = jnp.split(z, n_chunks, axis=1)
        outs = [decode(vae_params, p) for p in parts]
        return np.concatenate([np.asarray(o) for o in outs], axis=1)

    for n_chunks in (1, 2, 4, 8, 16):
        # compile this slice shape
        z = jnp.asarray(
            rng.normal(size=(B, F, HW, HW, 4)), jnp.float32
        ).astype(DTYPE)
        fetch(z, n_chunks)
        times = []
        for _ in range(REPS):
            z = jnp.asarray(
                rng.normal(size=(B, F, HW, HW, 4)), jnp.float32
            ).astype(DTYPE)
            jax.block_until_ready(z)
            t0 = time.perf_counter()
            out = fetch(z, n_chunks)
            times.append(time.perf_counter() - t0)
            assert out.shape == (B, F, 512, 512, 3)
        print(
            f"n_chunks={n_chunks:2d}: "
            + " ".join(f"{t*1000:7.1f}ms" for t in times)
            + f"  (min {min(times)*1000:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
