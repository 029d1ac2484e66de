"""Effective HBM bandwidth probe on real activation shapes.

Measures read+write GB/s for simple elementwise ops over the UNet's
activation shapes, amortized inside one jitted lax.scan (tunnel dispatch
latency excluded), with varying input so dispatches are not deduped.
"""

import os
import time

import sys, os as _os
sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.utils.compile_cache import setup_compile_cache

setup_compile_cache()  # edit-stable keys: see utils/compile_cache.py

STEPS = 50


def bench(name, shape, dtype, fn, bytes_moved):
    x = jnp.ones(shape, dtype) * 1.000001

    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        y, _ = jax.lax.scan(body, x, (), length=STEPS)
        return y

    run(x).block_until_ready()
    n = 3
    t0 = time.perf_counter()
    for i in range(n):
        x = run(x + jnp.asarray(i * 1e-9, dtype))
    x.block_until_ready()
    dt = (time.perf_counter() - t0) / (n * STEPS)
    gbps = bytes_moved / dt / 1e9
    print(f"{name:44s} {dt*1e3:8.3f} ms  {gbps:7.1f} GB/s")


def main():
    print(f"devices: {jax.devices()}")
    bf = jnp.bfloat16

    for c in (320, 384, 256, 512):
        shape = (16, 64, 64, c)
        nbytes = int(np.prod(shape)) * 2
        bench(f"mul x*1.01 (16,64,64,{c}) bf16", shape, bf,
              lambda x: x * jnp.asarray(1.01, x.dtype), 2 * nbytes)

    # big flat tensor — layout-trivial case
    for n in (16 * 64 * 64 * 320,):
        shape = (n // 512, 512)
        bench(f"mul flat ({shape}) bf16", shape, bf,
              lambda x: x * jnp.asarray(1.01, x.dtype), 2 * n * 2)

    shape = (16, 64, 64, 320)
    nbytes = int(np.prod(shape)) * 2

    # add two tensors: 2 reads + 1 write
    y = jnp.ones(shape, bf)
    bench("add x+x (16,64,64,320) bf16", shape, bf,
          lambda x: x + x * jnp.asarray(1.01, x.dtype), 3 * nbytes)

    # GN-normalize-like chain: x*w + b with per-channel w,b (f32 math)
    w = jnp.ones((320,), jnp.float32)
    b = jnp.zeros((320,), jnp.float32)
    bench("affine f32-math (16,64,64,320) bf16", shape, bf,
          lambda x: (x.astype(jnp.float32) * w + b).astype(x.dtype) * jnp.asarray(1.0001, x.dtype),
          2 * nbytes)

    # per-channel spatial mean (stats pass): read only
    def stats(x):
        xf = x.astype(jnp.float32).reshape(16, 4096, 320)
        s1 = jnp.mean(xf, axis=1)
        s2 = jnp.mean(jnp.square(xf), axis=1)
        # fold stats back so the scan carry keeps shape
        return x + (s1[:, None, :] * 0).reshape(16, 1, 1, 320).astype(x.dtype)
    bench("GN stats+broadcast (16,64,64,320) bf16", shape, bf, stats, 2 * nbytes)

    # grouped reduce the old way (lane split) for comparison
    def stats_split(x):
        xf = x.astype(jnp.float32).reshape(16, 4096, 32, 10)
        m = jnp.mean(xf, axis=(1, 3), keepdims=True)
        return x + (m * 0).reshape(16, 1, 1, 32).repeat(10, -1).astype(x.dtype)
    bench("GN stats lane-split (16,64,64,320) bf16", shape, bf, stats_split, 2 * nbytes)


if __name__ == "__main__":
    main()
