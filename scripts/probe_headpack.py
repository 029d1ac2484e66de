"""Probe: can head-packing/blockdiag recover the d=40 MXU logits padding?

PERF.md claims the 3.2x padding waste of d=40 per-head attention
contractions on the 128-wide MXU is irreducible — that "blockdiag /
head-packing rearrangements all waste exactly as much as they save".
The arithmetic: packing P=3 heads gives a 120-wide (dense-looking)
contraction, but producing per-head logits then needs a (S, P*S) output
against a BLOCK-DIAGONAL key matrix, so 2/3 of the multiplies hit
structural zeros — useful fraction 40/128 either way.  This probe makes
the claim regenerable by measuring both forms on the real chip at the
flash-attention logits shape (S=4096, d=40 — the 64x64 spatial
self-attention):

  baseline   per-head batched dot   (G_heads, S, 40) x (G_heads, S, 40)
  packed     blockdiag 3-head pack  (G_packs, S, 120) x (G_packs, 3S, 120)
             [same useful FLOPs, 3x wider output, zeros off-block]

reported with the packed form both excluding and including the in-graph
blockdiag construction (a real kernel would rebuild it every call, since
k changes per step).  packed ~= baseline (or worse) confirms the floor
claim; packed meaningfully faster would mean logits headroom exists.

    python scripts/probe_headpack.py
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

STEPS = 20
S, D, HEADS, PACK = 4096, 40, 6, 3  # 6 heads -> 2 exact 3-head packs


def timed_scan(fn, make_xs, steps=STEPS):
    """Device seconds per fn(*xs) application, amortized in one jitted scan.

    In-graph, iterations chain through the carry (data dependence blocks
    hoisting).  Across dispatches, the timed call gets FRESH random
    buffers from ``make_xs`` — a bf16 ``x * 1.000001`` rounds back to x
    (bf16 spacing ~0.4%), which would make the timed dispatch bit-identical
    to the warmup and eligible for the tunnel's dispatch dedupe."""

    @jax.jit
    def run(*xs):
        def body(c, _):
            y = fn(*[x * (1.0 + 1e-6 * c).astype(x.dtype) for x in xs])
            return c + 1e-6 * jnp.tanh(y).astype(c.dtype), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=steps)
        return c

    float(run(*make_xs()))  # compile + sync
    t0 = time.time()
    float(run(*make_xs()))  # fresh buffers — cannot be served as a replay
    return (time.time() - t0) / steps


def blockdiag_keys(k):
    """(G_packs, PACK, S, D) keys -> (G_packs, PACK*S, PACK*D) block-diagonal
    layout: pack p's keys occupy rows [p*S:(p+1)*S], cols [p*D:(p+1)*D]."""
    g = k.shape[0]
    blocks = []
    for p in range(PACK):
        pads = [(0, 0), (0, 0), (p * D, (PACK - 1 - p) * D)]
        blocks.append(jnp.pad(k[:, p], pads))
    return jnp.concatenate(blocks, axis=1)  # (g, PACK*S, PACK*D)


def main():
    dtype = jnp.bfloat16
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    g = HEADS // PACK

    def fresh_qk():
        q = jnp.asarray(rng.normal(size=(HEADS, S, D)), jnp.float32).astype(dtype)
        k = jnp.asarray(rng.normal(size=(HEADS, S, D)), jnp.float32).astype(dtype)
        return q, k

    def to_packed(q, k):
        qp = q.reshape(g, PACK, S, D).transpose(0, 2, 1, 3).reshape(
            g, S, PACK * D
        )
        return qp, k.reshape(g, PACK, S, D)

    def baseline(q, k):
        logits = jnp.einsum(
            "hsd,htd->hst", q, k, preferred_element_type=jnp.float32
        )
        return jnp.max(logits)

    def packed(qp, kbd):
        logits = jnp.einsum(
            "gsd,gtd->gst", qp, kbd, preferred_element_type=jnp.float32
        )
        return jnp.max(logits)

    def packed_with_build(qp, kp4):
        return packed(qp, blockdiag_keys(kp4))

    def fresh_prebuilt():
        qp, kp4 = to_packed(*fresh_qk())
        return qp, blockdiag_keys(kp4)

    t_base = timed_scan(baseline, fresh_qk)
    t_pack = timed_scan(packed, fresh_prebuilt)
    t_pack_b = timed_scan(packed_with_build, lambda: to_packed(*fresh_qk()))
    print(
        f"logits dots, {HEADS} heads S={S} d={D} (useful "
        f"{HEADS*S*S*D*2/1e9:.0f} GFLOP/call):\n"
        f"  per-head padded   {t_base*1e3:7.2f} ms\n"
        f"  3-head blockdiag  {t_pack*1e3:7.2f} ms (pre-built keys)  "
        f"ratio {t_pack/t_base:.3f}\n"
        f"  3-head blockdiag  {t_pack_b*1e3:7.2f} ms (incl. in-graph build) "
        f"ratio {t_pack_b/t_base:.3f}\n"
        f"  >=1.0 ratios confirm PERF.md: packing wastes as much as it saves",
        flush=True,
    )


if __name__ == "__main__":
    main()
