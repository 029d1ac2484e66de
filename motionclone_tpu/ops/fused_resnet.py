"""Fully fused ResnetBlock3D as one per-frame Pallas TPU kernel.

One ``ResnetBlock3D`` (reference resnet.py:109-213) is, in XLA, ~10 HBM
passes over the activation: GN1 stats, GN1 normalize+SiLU, conv1, temb add,
GN2 stats, GN2 normalize+SiLU, conv2, shortcut, residual add.  On v5e the
elementwise passes run at only ~100-270 GB/s effective (PERF.md), so at
512^2 the norms and adds cost more than the convolutions.

This kernel executes the whole block per frame — the inflated GroupNorm's
statistics are per (sample, frame) (reference resnet.py:21-29), so with one
video frame resident in VMEM every step is local:

    x -> GN1 -> SiLU -> conv3x3 -> (+ temb) -> GN2 -> SiLU -> conv3x3
      -> + shortcut(x)

reading ``x`` once from HBM and writing the result once.

Mosaic-friendly construction (no lane/sublane reshapes of big tiles):

* the 3x3 convolution runs over a flattened ``(H*W, C)`` frame stored in a
  1D-row-padded VMEM scratch; tap ``(dy, dx)`` is the static row-slice at
  offset ``dy*W + dx`` of that scratch, horizontally-clipped taps are
  masked with an iota row mask, and each tap is one ``(H*W, Cin) @
  (Cin, Cout)`` MXU dot;
* GroupNorm's per-group moments come from per-channel moments (a sublane
  reduction) combined through tiny constant matmuls ``(1,C)@(C,G)`` and
  expanded back with ``(1,G)@(G,C)`` — the lane dimension is never split.

Forward-only by design: the non-differentiated UNet passes (unconditional
CFG branch, vanilla phase) use it; the guided pass keeps the unfused XLA
path, which JAX can differentiate.

The time embedding enters pre-projected: callers compute
``time_emb_proj(silu(temb))`` outside (a (B, 1280) x (1280, Cout) matmul —
microscopic) and the kernel adds the (B, Cout) row per frame, matching
``time_embedding_norm == "default"`` (reference resnet.py:174-179).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# conv1 + conv2 + shortcut weights must stay resident in VMEM (v5e: 128 MB)
MAX_WEIGHT_BYTES = 48 * 1024 * 1024


class ResnetWeights(NamedTuple):
    """Parameters of one ResnetBlock3D, flax layouts.

    Conv kernels are packed ``(3, 3, Cin, Cout) -> (9 * Cin, Cout)`` so the
    kernel slices row-blocks per tap; GN params are f32 ``(C,)``.
    """

    gn1_scale: jnp.ndarray
    gn1_bias: jnp.ndarray
    w1: jnp.ndarray  # (9 * Cin, Cout)
    b1: jnp.ndarray
    gn2_scale: jnp.ndarray
    gn2_bias: jnp.ndarray
    w2: jnp.ndarray  # (9 * Cout, Cout)
    b2: jnp.ndarray
    wsc: Optional[jnp.ndarray]  # (Cin, Cout) 1x1 shortcut, None if identity
    bsc: Optional[jnp.ndarray]


def _group_matrices(c: int, groups: int):
    """(C, G) group-averaging and (G, C) group-expanding constant matrices."""
    cg = c // groups
    gidx = np.arange(c) // cg
    mavg = np.zeros((c, groups), np.float32)
    mavg[np.arange(c), gidx] = 1.0 / cg
    mexp = np.zeros((groups, c), np.float32)
    mexp[gidx, np.arange(c)] = 1.0
    return jnp.asarray(mavg), jnp.asarray(mexp)


def _group_norm_silu(xf, scale, bias, mavg_ref, mexp_ref, eps):
    """f32 (HW, C) -> GN (per-frame stats) -> SiLU, staying f32.

    ``scale``/``bias``: (1, C) f32; group combine/expand via tiny matmuls.
    """
    s1 = jnp.mean(xf, axis=0, keepdims=True)             # (1, C)
    s2 = jnp.mean(jnp.square(xf), axis=0, keepdims=True)
    g1 = jnp.dot(s1, mavg_ref[...], preferred_element_type=jnp.float32)
    g2 = jnp.dot(s2, mavg_ref[...], preferred_element_type=jnp.float32)
    var = jnp.maximum(g2 - jnp.square(g1), 0.0)
    rstd = jax.lax.rsqrt(var + eps)                      # (1, G)
    mean_c = jnp.dot(g1, mexp_ref[...], preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd, mexp_ref[...], preferred_element_type=jnp.float32)
    w = rstd_c * scale
    b = bias - mean_c * w
    y = xf * w + b
    return y * jax.nn.sigmoid(y)


def _conv3x3(pad_ref, a2d, w_ref, h, wdt, cin, cout, lead, dtype):
    """9 masked row-shifted MXU dots; ``a2d``: (H*W, Cin) conv input."""
    hw = h * wdt
    pad_ref[0:lead, :] = jnp.zeros((lead, cin), dtype)
    pad_ref[lead : lead + hw, :] = a2d
    pad_ref[lead + hw :, :] = jnp.zeros(
        (pad_ref.shape[0] - lead - hw, cin), dtype
    )
    wpos = jax.lax.rem(
        jax.lax.broadcasted_iota(jnp.int32, (hw, 1), 0), wdt
    )
    mask_l = wpos != 0          # tap reads previous row's last pixel
    mask_r = wpos != (wdt - 1)  # tap reads next row's first pixel
    acc = jnp.zeros((hw, cout), jnp.float32)
    for k in range(9):
        dy, dx = divmod(k, 3)
        off = lead - wdt - 1 + dy * wdt + dx
        win = pad_ref[off : off + hw, :]
        if dx == 0:
            win = jnp.where(mask_l, win, jnp.zeros_like(win))
        elif dx == 2:
            win = jnp.where(mask_r, win, jnp.zeros_like(win))
        acc += jnp.dot(
            win, w_ref[k * cin : (k + 1) * cin, :],
            preferred_element_type=jnp.float32,
        )
    return acc


def _kernel(
    x_ref, t_ref,
    gn1_s, gn1_b, w1, b1, gn2_s, gn2_b, w2, b2,
    mavg1, mexp1, mavg2, mexp2, *rest,
    y_ref, pad1, pad2,
    eps: float, has_shortcut: bool, has_temb: bool, lead: int,
):
    h, wdt, cin = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    cout = y_ref.shape[3]
    dtype = x_ref.dtype
    hw = h * wdt

    x2d = x_ref[0].reshape(hw, cin)  # contiguous merge
    xf = x2d.astype(jnp.float32)

    a1 = _group_norm_silu(xf, gn1_s[...], gn1_b[...], mavg1, mexp1, eps)
    hconv = _conv3x3(pad1, a1.astype(dtype), w1, h, wdt, cin, cout, lead, dtype)
    hconv = hconv + b1[...]
    if has_temb:
        hconv = hconv + t_ref[0].astype(jnp.float32)

    a2 = _group_norm_silu(hconv, gn2_s[...], gn2_b[...], mavg2, mexp2, eps)
    out = _conv3x3(pad2, a2.astype(dtype), w2, h, wdt, cout, cout, lead, dtype)
    out = out + b2[...]

    if has_shortcut:
        wsc, bsc = rest[0], rest[1]
        sc = jnp.dot(
            x2d, wsc[...], preferred_element_type=jnp.float32
        ) + bsc[...]
    else:
        sc = xf
    y_ref[0] = (out + sc).reshape(h, wdt, cout).astype(dtype)


def _lead(wdt: int) -> int:
    # leading pad rows: >= W+1 so every tap offset is >= 0, 8-aligned so the
    # big center store starts on a sublane-tile boundary
    return ((wdt + 1 + 7) // 8) * 8


def supported(
    x_shape, cout: int, groups: int, time_embedding_norm: str = "default",
    itemsize: int = 2,
) -> bool:
    """Whether the fused kernel can run this block (else: unfused path).

    ``itemsize``: bytes per element of the compute dtype (2 for bf16, 4 for
    f32) — the VMEM estimates scale with it."""
    if len(x_shape) != 5:
        return False
    _, _, h, w, cin = x_shape
    if time_embedding_norm != "default":
        return False
    if cin % groups or cout % groups:
        return False
    if cin % 8 or cout % 8 or w % 8 or h < 3 or w < 3:
        return False
    weight_bytes = (9 * cin * cout + 9 * cout * cout + cin * cout) * itemsize
    if weight_bytes > MAX_WEIGHT_BYTES:
        return False
    # frame + two padded copies + f32 accumulators must fit VMEM comfortably
    frame_bytes = (
        (h * w + 2 * w + 16) * (cin + cout) * itemsize + h * w * cout * 4
    )
    return frame_bytes < 24 * 1024 * 1024


def fused_resnet_block(
    x: jnp.ndarray,
    temb_out: Optional[jnp.ndarray],
    w: ResnetWeights,
    *,
    groups: int,
    eps: float,
) -> jnp.ndarray:
    """Run one ResnetBlock3D over (B, F, H, W, Cin) -> (B, F, H, W, Cout).

    ``temb_out``: pre-projected time embedding (B, Cout) or None.  Check
    :func:`supported` first.  Forward-only (no VJP).
    """
    b, f, h, wdt, cin = x.shape
    cout = w.w1.shape[-1]
    dtype = x.dtype
    has_shortcut = w.wsc is not None
    has_temb = temb_out is not None
    lead = _lead(wdt)

    xr = x.reshape(b * f, h, wdt, cin)
    # temb rows as (B, 1, Cout): Mosaic needs per-row blocks whose trailing
    # dims equal the array's, so a (1, 1, Cout) block is legal for any B
    if has_temb:
        t = jnp.asarray(temb_out, dtype).reshape(b, 1, cout)
    else:
        t = jnp.zeros((b, 1, cout), dtype)

    def vec(a):  # 1D f32 params as (1, n) 2D VMEM blocks
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    def w_spec(arr):
        return pl.BlockSpec(arr.shape, lambda bi: (0,) * arr.ndim,
                            memory_space=pltpu.VMEM)

    mavg1, mexp1 = _group_matrices(cin, groups)
    mavg2, mexp2 = _group_matrices(cout, groups)

    weights = [
        vec(w.gn1_scale), vec(w.gn1_bias),
        jnp.asarray(w.w1, dtype), vec(w.b1),
        vec(w.gn2_scale), vec(w.gn2_bias),
        jnp.asarray(w.w2, dtype), vec(w.b2),
        mavg1, mexp1, mavg2, mexp2,
    ]
    if has_shortcut:
        weights += [jnp.asarray(w.wsc, dtype), vec(w.bsc)]

    in_specs = [
        pl.BlockSpec((1, h, wdt, cin), lambda bi: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, cout), lambda bi: (bi // f, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [w_spec(a) for a in weights]

    kernel = functools.partial(
        _kernel, eps=eps,
        has_shortcut=has_shortcut, has_temb=has_temb, lead=lead,
    )

    def wrapped(*refs):
        # split positional refs: inputs..., output, scratches
        kernel(*refs[:-3], y_ref=refs[-3], pad1=refs[-2], pad2=refs[-1])

    pad_rows = lead + h * wdt + wdt + 8
    out = pl.pallas_call(
        wrapped,
        grid=(b * f,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, wdt, cout), lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * f, h, wdt, cout), dtype),
        scratch_shapes=[
            pltpu.VMEM((pad_rows, cin), dtype),
            pltpu.VMEM((pad_rows, cout), dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * f * h * wdt * (9 * cin * cout + 9 * cout * cout),
            bytes_accessed=b * f * h * wdt * (cin + cout) * 2,
            transcendentals=b * f * h * wdt * (cin + cout),
        ),
        interpret=jax.default_backend() != "tpu",
    )(xr, t, *weights)
    return out.reshape(b, f, h, wdt, cout)
