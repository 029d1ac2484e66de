"""Torch-oracle numerics: JAX modules vs the reference's exact torch math.

Each fixture re-implements a reference module's forward math in *functional*
torch (cited as reference file:line), generates a random torch state dict
using the reference's checkpoint key names, converts it through
``weights.convert.torch_to_flax``, and asserts f32 agreement with the JAX
module.  This turns the #1 silent-error risk of SURVEY §7 (checkpoint key
mapping + layout transposes between torch's ``b c f h w`` and this
framework's ``b f h w c``) into a tested invariant: a wrong kernel transpose
or swapped parameter shows up as a numeric mismatch here, not as subtly
wrong videos.

All math runs in float32 on CPU.  Oracles:
  - InflatedConv3d / InflatedGroupNorm        reference resnet.py:10-29
  - Upsample3D / Downsample3D                 reference resnet.py:32-106
  - ResnetBlock3D (default + scale_shift)     reference resnet.py:109-213
  - PositionalEncoding table                  reference motion_module.py:228-247
  - VersatileAttention (+ PE, + probs)        reference motion_module.py:250-345
  - TemporalTransformer3DModel (full module)  reference motion_module.py:88-225
  - BasicTransformerBlock (self+cross+GEGLU)  reference attention.py:145-300
  - Transformer3DModel (spatial, conv proj)   reference attention.py:31-142
  - get_timestep_embedding                    diffusers (used by unet.py:101-104)
  - schedule_customized_step (guided DDIM)    reference motionclone_functions.py:286-409
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from motionclone_tpu.weights.convert import torch_to_flax, validate_against

torch.set_default_dtype(torch.float32)

ATOL = 3e-5
RTOL = 2e-5


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def rng(seed):
    return np.random.default_rng(seed)


def randn(r, *shape, scale=1.0):
    return (r.standard_normal(shape) * scale).astype(np.float32)


def to_torch_video(x_bfhwc: np.ndarray) -> torch.Tensor:
    """(B, F, H, W, C) channels-last -> reference (B, C, F, H, W)."""
    return torch.from_numpy(np.ascontiguousarray(x_bfhwc.transpose(0, 4, 1, 2, 3)))


def from_torch_video(t: torch.Tensor) -> np.ndarray:
    """(B, C, F, H, W) -> (B, F, H, W, C)."""
    return np.ascontiguousarray(t.numpy().transpose(0, 2, 3, 4, 1))


def fold_bcfhw(t: torch.Tensor) -> torch.Tensor:
    """rearrange 'b c f h w -> (b f) c h w' (reference resnet.py:14)."""
    b, c, f, h, w = t.shape
    return t.permute(0, 2, 1, 3, 4).reshape(b * f, c, h, w)


def unfold_bcfhw(t: torch.Tensor, f: int) -> torch.Tensor:
    """rearrange '(b f) c h w -> b c f h w' (reference resnet.py:16)."""
    bf, c, h, w = t.shape
    return t.reshape(bf // f, f, c, h, w).permute(0, 2, 1, 3, 4)


def t_inflated_conv(x, w, b, stride=1, padding=1):
    """InflatedConv3d (reference resnet.py:10-18)."""
    f = x.shape[2]
    return unfold_bcfhw(TF.conv2d(fold_bcfhw(x), w, b, stride=stride, padding=padding), f)


def t_inflated_groupnorm(x, groups, w, b, eps=1e-6):
    """InflatedGroupNorm (reference resnet.py:21-29): per-(sample, frame) stats."""
    f = x.shape[2]
    return unfold_bcfhw(TF.group_norm(fold_bcfhw(x), groups, w, b, eps=eps), f)


def t_linear(x, sd, prefix):
    w = sd[f"{prefix}.weight"]
    b = sd.get(f"{prefix}.bias")
    return TF.linear(x, w, b)


def reshape_heads_to_batch(t: torch.Tensor, heads: int) -> torch.Tensor:
    """reference attention.py:369-374."""
    b, s, d = t.shape
    return t.reshape(b, s, heads, d // heads).permute(0, 2, 1, 3).reshape(b * heads, s, d // heads)


def reshape_batch_to_heads(t: torch.Tensor, heads: int) -> torch.Tensor:
    """reference attention.py:376-381."""
    b, s, d = t.shape
    return t.reshape(b // heads, heads, s, d).permute(0, 2, 1, 3).reshape(b // heads, s, d * heads)


def t_attention(q, k, v, heads, scale, return_probs=False):
    """CrossAttention._attention (reference attention.py:461-490): plain
    softmax(q kᵀ · scale) v over head-batched tensors."""
    qh = reshape_heads_to_batch(q, heads)
    kh = reshape_heads_to_batch(k, heads)
    vh = reshape_heads_to_batch(v, heads)
    probs = torch.softmax(torch.bmm(qh, kh.transpose(1, 2)) * scale, dim=-1)
    out = reshape_batch_to_heads(torch.bmm(probs, vh), heads)
    return (out, probs) if return_probs else out


def t_positional_encoding(d_model, max_len):
    """PositionalEncoding buffer (reference motion_module.py:236-241)."""
    position = torch.arange(max_len).unsqueeze(1)
    div_term = torch.exp(torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = torch.zeros(1, max_len, d_model)
    pe[0, :, 0::2] = torch.sin(position * div_term)
    pe[0, :, 1::2] = torch.cos(position * div_term)
    return pe


def t_geglu_ff(x, sd, prefix):
    """diffusers FeedForward(activation_fn='geglu', mult=4): GEGLU -> Linear
    (used by reference attention.py:211, motion_module.py:209)."""
    h = t_linear(x, sd, f"{prefix}.net.0.proj")
    h, gate = h.chunk(2, dim=-1)
    h = h * TF.gelu(gate)
    return t_linear(h, sd, f"{prefix}.net.2")


def t_layer_norm(x, sd, prefix, eps=1e-5):
    w = sd[f"{prefix}.weight"]
    return TF.layer_norm(x, (x.shape[-1],), w, sd[f"{prefix}.bias"], eps=eps)


def make_sd(spec, seed):
    """Random torch state dict from {key: shape}; Linear/conv weights scaled
    to keep activations O(1) through deep stacks."""
    r = rng(seed)
    sd = {}
    for key, shape in spec.items():
        if key.endswith(".bias") or len(shape) == 1:
            sd[key] = torch.from_numpy(randn(r, *shape, scale=0.2))
        else:
            fan_in = int(np.prod(shape[1:]))
            sd[key] = torch.from_numpy(randn(r, *shape, scale=fan_in**-0.5))
    return sd


def flax_params(module, sd, *init_args, **init_kwargs):
    """torch state dict -> flax params, validated against the module's own
    initialized tree (the load-path guarantee, weights/convert.py)."""
    tree = torch_to_flax({k: v.numpy() for k, v in sd.items()})
    init = module.init(jax.random.PRNGKey(0), *init_args, **init_kwargs)
    validate_against(tree, init["params"])
    return {"params": tree}


def assert_close(jax_arr, torch_arr, atol=ATOL, rtol=RTOL, label=""):
    a = np.asarray(jax_arr, dtype=np.float32)
    b = torch_arr.numpy() if isinstance(torch_arr, torch.Tensor) else np.asarray(torch_arr)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=label)


# ---------------------------------------------------------------------------
# inflated primitives (reference resnet.py:10-106)
# ---------------------------------------------------------------------------


def test_inflated_conv_matches_torch():
    from motionclone_tpu.models.layers import conv2d, spatial_conv

    r = rng(0)
    x = randn(r, 1, 3, 6, 6, 8)  # (B, F, H, W, C)
    w = torch.from_numpy(randn(r, 16, 8, 3, 3, scale=0.1))  # OIHW
    b = torch.from_numpy(randn(r, 16, scale=0.1))

    expected = from_torch_video(t_inflated_conv(to_torch_video(x), w, b))

    class M(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x):
            return spatial_conv(x, conv2d(16, name="conv"))

    m = M()
    params = {"params": {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                                  "bias": jnp.asarray(b.numpy())}}}
    got = m.apply(params, jnp.asarray(x))
    assert_close(got, expected, label="inflated conv 3x3")


def test_inflated_conv_stride2_and_1x1_match_torch():
    from motionclone_tpu.models.layers import conv2d, spatial_conv
    import flax.linen as nn

    r = rng(1)
    x = randn(r, 2, 2, 8, 8, 4)

    for kernel, stride, padding in ((3, 2, 1), (1, 1, 0)):
        w = torch.from_numpy(randn(r, 6, 4, kernel, kernel, scale=0.2))
        b = torch.from_numpy(randn(r, 6, scale=0.2))
        expected = from_torch_video(
            t_inflated_conv(to_torch_video(x), w, b, stride=stride, padding=padding)
        )

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                return spatial_conv(
                    x, conv2d(6, kernel=kernel, stride=stride, padding=padding, name="conv")
                )

        params = {"params": {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                                      "bias": jnp.asarray(b.numpy())}}}
        got = M().apply(params, jnp.asarray(x))
        assert_close(got, expected, label=f"conv k{kernel} s{stride}")


def test_inflated_groupnorm_matches_torch():
    from motionclone_tpu.models.layers import group_norm, make_group_norm
    import flax.linen as nn

    r = rng(2)
    x = randn(r, 1, 3, 5, 5, 8, scale=2.0) + 0.5
    w = torch.from_numpy(randn(r, 8) + 1.0)
    b = torch.from_numpy(randn(r, 8, scale=0.3))

    # per-frame stats (InflatedGroupNorm, reference resnet.py:21-29)
    expected = from_torch_video(t_inflated_groupnorm(to_torch_video(x), 4, w, b, eps=1e-6))

    class M(nn.Module):
        per_frame: bool = True

        @nn.compact
        def __call__(self, x):
            return group_norm(x, make_group_norm(4, 1e-6, name="norm"),
                              per_frame=self.per_frame)

    params = {"params": {"norm": {"scale": jnp.asarray(w.numpy()),
                                  "bias": jnp.asarray(b.numpy())}}}
    got = M().apply(params, jnp.asarray(x))
    assert_close(got, expected, label="inflated groupnorm")

    # non-inflated: plain nn.GroupNorm on the 5-D b c f h w tensor — stats
    # span frames too (reference resnet.py:145-147 use_inflated_groupnorm=False)
    expected5 = from_torch_video(
        TF.group_norm(to_torch_video(x), 4, w, b, eps=1e-6)
    )
    got5 = M(per_frame=False).apply(params, jnp.asarray(x))
    assert_close(got5, expected5, label="plain groupnorm over video")


def test_upsample_downsample_match_torch():
    from motionclone_tpu.models.layers import Downsample, Upsample

    r = rng(3)
    x = randn(r, 1, 2, 4, 4, 8)
    w = torch.from_numpy(randn(r, 8, 8, 3, 3, scale=0.1))
    b = torch.from_numpy(randn(r, 8, scale=0.1))
    params = {"params": {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                                  "bias": jnp.asarray(b.numpy())}}}

    # Upsample3D (reference resnet.py:47-81): nearest x2 spatial only, then conv
    xt = to_torch_video(x)
    up = TF.interpolate(xt, scale_factor=(1.0, 2.0, 2.0), mode="nearest")
    expected_up = from_torch_video(t_inflated_conv(up, w, b))
    got_up = Upsample(features=8).apply(params, jnp.asarray(x))
    assert_close(got_up, expected_up, label="upsample")

    # Downsample3D (reference resnet.py:84-106): stride-2 conv
    expected_dn = from_torch_video(t_inflated_conv(xt, w, b, stride=2))
    got_dn = Downsample(features=8).apply(params, jnp.asarray(x))
    assert_close(got_dn, expected_dn, label="downsample")


# ---------------------------------------------------------------------------
# ResnetBlock3D (reference resnet.py:109-213)
# ---------------------------------------------------------------------------


def t_resnet_block(x, temb, sd, groups, time_embedding_norm, osf=1.0, eps=1e-6):
    """ResnetBlock3D.forward (reference resnet.py:185-213), inflated GN."""
    h = t_inflated_groupnorm(x, groups, sd["norm1.weight"], sd["norm1.bias"], eps=eps)
    h = TF.silu(h)
    h = t_inflated_conv(h, sd["conv1.weight"], sd["conv1.bias"])
    t = None
    if temb is not None:
        t = t_linear(TF.silu(temb), sd, "time_emb_proj")[:, :, None, None, None]
        if time_embedding_norm == "default":
            h = h + t
    h = t_inflated_groupnorm(h, groups, sd["norm2.weight"], sd["norm2.bias"], eps=eps)
    if t is not None and time_embedding_norm == "scale_shift":
        scale, shift = torch.chunk(t, 2, dim=1)
        h = h * (1 + scale) + shift
    h = TF.silu(h)
    h = t_inflated_conv(h, sd["conv2.weight"], sd["conv2.bias"])
    if "conv_shortcut.weight" in sd:
        x = t_inflated_conv(x, sd["conv_shortcut.weight"], sd["conv_shortcut.bias"],
                            padding=0)
    return (x + h) / osf


@pytest.mark.parametrize("time_embedding_norm", ["default", "scale_shift"])
def test_resnet_block_matches_torch(time_embedding_norm):
    from motionclone_tpu.models.resnet import ResnetBlock3D

    cin, cout, groups, temb_ch = 8, 16, 4, 12
    t_mult = 2 if time_embedding_norm == "scale_shift" else 1
    sd = make_sd({
        "norm1.weight": (cin,), "norm1.bias": (cin,),
        "conv1.weight": (cout, cin, 3, 3), "conv1.bias": (cout,),
        "time_emb_proj.weight": (cout * t_mult, temb_ch),
        "time_emb_proj.bias": (cout * t_mult,),
        "norm2.weight": (cout,), "norm2.bias": (cout,),
        "conv2.weight": (cout, cout, 3, 3), "conv2.bias": (cout,),
        "conv_shortcut.weight": (cout, cin, 1, 1), "conv_shortcut.bias": (cout,),
    }, seed=10)

    r = rng(11)
    x = randn(r, 1, 3, 6, 6, cin)
    temb = randn(r, 1, temb_ch)

    expected = from_torch_video(t_resnet_block(
        to_torch_video(x), torch.from_numpy(temb), sd, groups, time_embedding_norm
    ))

    # note: the reference builds ResnetBlock3D with eps=1e-6 (resnet.py:121)
    m = ResnetBlock3D(out_channels=cout, groups=groups, eps=1e-6,
                      time_embedding_norm=time_embedding_norm,
                      attention_impl="xla")
    params = flax_params(m, sd, jnp.asarray(x), jnp.asarray(temb))
    got = m.apply(params, jnp.asarray(x), jnp.asarray(temb))
    assert_close(got, expected, label=f"resnet block {time_embedding_norm}")


# ---------------------------------------------------------------------------
# temporal attention (reference motion_module.py:228-345)
# ---------------------------------------------------------------------------


def test_positional_encoding_table_matches_torch():
    from motionclone_tpu.models.embeddings import temporal_positional_encoding

    for d_model, max_len in ((64, 24), (32, 32), (10, 16)):
        expected = t_positional_encoding(d_model, max_len)[0]
        got = temporal_positional_encoding(d_model, max_len)
        assert_close(got, expected, atol=1e-6, label=f"pe d{d_model} L{max_len}")


def t_versatile_attention(x_bfsc, sd, heads, max_len, use_pe=True,
                          return_probs=False):
    """VersatileAttention.forward, Temporal mode (motion_module.py:274-345):
    rearrange '(b f) d c -> (b d) f c', add PE, q/k/v (no bias), head-batched
    softmax attention, to_out linear, rearrange back.  Returns output in
    (B, F, S, C) plus optionally probs (B, S, heads, F, F) — matching the
    repo module's natural-layout surface."""
    B, F_, S, C = x_bfsc.shape
    h = torch.from_numpy(x_bfsc).permute(0, 2, 1, 3).reshape(B * S, F_, C)
    if use_pe:
        h = h + t_positional_encoding(C, max_len)[:, :F_]
    q = t_linear(h, sd, "to_q")
    k = t_linear(h, sd, "to_k")
    v = t_linear(h, sd, "to_v")
    scale = (C // heads) ** -0.5
    out, probs = t_attention(q, k, v, heads, scale, return_probs=True)
    out = t_linear(out, sd, "to_out.0")
    out = out.reshape(B, S, F_, C).permute(0, 2, 1, 3)  # -> (B, F, S, C)
    if return_probs:
        return out, probs.reshape(B, S, heads, F_, F_)
    return out


def test_versatile_attention_matches_torch():
    from motionclone_tpu.models.motion_module import VersatileAttention

    B, F_, S, C, heads = 1, 4, 9, 32, 4
    sd = make_sd({
        "to_q.weight": (C, C), "to_k.weight": (C, C), "to_v.weight": (C, C),
        "to_out.0.weight": (C, C), "to_out.0.bias": (C,),
    }, seed=20)
    x = randn(rng(21), B, F_, S, C)

    expected_out, expected_probs = t_versatile_attention(
        x, sd, heads, max_len=24, return_probs=True
    )

    m = VersatileAttention(heads=heads, dim_head=C // heads, query_dim=C,
                           pos_encoding_max_len=24, attention_impl="xla")
    params = flax_params(m, sd, jnp.asarray(x))
    got_out, got_probs = m.apply(params, jnp.asarray(x), return_probs=True)
    assert_close(got_out, expected_out, label="versatile attention out")
    assert_close(got_probs, expected_probs, label="versatile attention probs")
    # the probs ARE the motion feature (motionclone_functions.py:260-283):
    # verify the reference's get_temp_attn_prob reshape (-1, heads, f, f)
    # ordering agrees with the (B, S, heads, F, F) aux output
    ref_flat = expected_probs.reshape(-1, heads, F_, F_)
    got_flat = np.asarray(got_probs).reshape(-1, heads, F_, F_)
    assert_close(got_flat, ref_flat, label="get_temp_attn_prob ordering")


def t_versatile_attention_t(h_bdfc, sd, heads, max_len):
    """t_versatile_attention on a live torch tensor already in the
    reference's (b d) f c layout — differentiable (used by the grad-path
    pipeline oracle).  Returns (out (b d) f c, probs (b d) heads f f)."""
    F_ = h_bdfc.shape[1]
    C = h_bdfc.shape[2]
    h = h_bdfc + t_positional_encoding(C, max_len)[:, :F_]
    q = t_linear(h, sd, "to_q")
    k = t_linear(h, sd, "to_k")
    v = t_linear(h, sd, "to_v")
    scale = (C // heads) ** -0.5
    out, probs = t_attention(q, k, v, heads, scale, return_probs=True)
    out = t_linear(out, sd, "to_out.0")
    bd = h_bdfc.shape[0]
    return out, probs.reshape(bd, heads, F_, F_)


def t_temporal_transformer(x_t, sd, heads, groups, n_attn, max_len,
                           return_probs=False):
    """TemporalTransformer3DModel.forward (motion_module.py:137-161) with one
    TemporalTransformerBlock (motion_module.py:213-225).  With
    ``return_probs`` also returns each attention block's probability map in
    (B, S, heads, F, F) — the layout of the repo module's aux output."""
    f = x_t.shape[2]
    x2 = fold_bcfhw(x_t)  # (b f) c h w
    bf, c, hh, ww = x2.shape
    B, S = bf // f, hh * ww
    residual = x2
    h = TF.group_norm(x2, groups, sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, c)
    h = t_linear(h, sd, "proj_in")
    blk = "transformer_blocks.0"
    all_probs = []
    for i in range(n_attn):
        normed = t_layer_norm(h, sd, f"{blk}.norms.{i}")
        # rearrange '(b f) d c -> (b d) f c' (motion_module.py:279)
        h_bdfc = normed.reshape(B, f, S, c).permute(0, 2, 1, 3).reshape(B * S, f, c)
        out, probs = t_versatile_attention_t(
            h_bdfc,
            {k[len(f"{blk}.attention_blocks.{i}."):]: v for k, v in sd.items()
             if k.startswith(f"{blk}.attention_blocks.{i}.")},
            heads, max_len,
        )
        all_probs.append(probs.reshape(B, S, heads, f, f))
        # '(b d) f c -> (b f) d c'
        out = out.reshape(B, S, f, c).permute(0, 2, 1, 3).reshape(bf, S, c)
        h = h + out
    h = h + t_geglu_ff(t_layer_norm(h, sd, f"{blk}.ff_norm"), sd, f"{blk}.ff")
    h = t_linear(h, sd, "proj_out")
    h = h.reshape(bf, hh, ww, c).permute(0, 3, 1, 2)
    out = unfold_bcfhw(h + residual, f)
    return (out, all_probs) if return_probs else out


def test_temporal_transformer_module_matches_torch():
    from motionclone_tpu.config import MotionModuleConfig
    from motionclone_tpu.models.motion_module import TemporalTransformer3D

    B, F_, H, W, C, heads, groups = 1, 4, 4, 4, 32, 4, 4
    blk = "transformer_blocks.0"
    spec = {"norm.weight": (C,), "norm.bias": (C,),
            "proj_in.weight": (C, C), "proj_in.bias": (C,),
            f"{blk}.ff_norm.weight": (C,), f"{blk}.ff_norm.bias": (C,),
            f"{blk}.ff.net.0.proj.weight": (8 * C, C),
            f"{blk}.ff.net.0.proj.bias": (8 * C,),
            f"{blk}.ff.net.2.weight": (C, 4 * C), f"{blk}.ff.net.2.bias": (C,),
            "proj_out.weight": (C, C), "proj_out.bias": (C,)}
    for i in range(2):
        spec.update({
            f"{blk}.norms.{i}.weight": (C,), f"{blk}.norms.{i}.bias": (C,),
            f"{blk}.attention_blocks.{i}.to_q.weight": (C, C),
            f"{blk}.attention_blocks.{i}.to_k.weight": (C, C),
            f"{blk}.attention_blocks.{i}.to_v.weight": (C, C),
            f"{blk}.attention_blocks.{i}.to_out.0.weight": (C, C),
            f"{blk}.attention_blocks.{i}.to_out.0.bias": (C,),
        })
    sd = make_sd(spec, seed=30)
    x = randn(rng(31), B, F_, H, W, C)

    expected = from_torch_video(
        t_temporal_transformer(to_torch_video(x), sd, heads, groups,
                               n_attn=2, max_len=24)
    )

    cfg = MotionModuleConfig(num_attention_heads=heads, norm_num_groups=groups)
    m = TemporalTransformer3D(cfg=cfg, attention_impl="xla")
    params = flax_params(m, sd, jnp.asarray(x))
    got, _ = m.apply(params, jnp.asarray(x))
    assert_close(got, expected, label="temporal transformer module")


# ---------------------------------------------------------------------------
# spatial transformer (reference attention.py:31-300)
# ---------------------------------------------------------------------------


def t_basic_transformer_block(h, ctx, sd, heads, prefix=""):
    """BasicTransformerBlock.forward (reference attention.py:259-300):
    LN -> self-attn -> +, LN -> cross-attn -> +, LN -> GEGLU FF -> +."""
    p = lambda s: f"{prefix}{s}"
    scale_q = (sd[p("attn1.to_q.weight")].shape[0] // heads) ** -0.5

    normed = t_layer_norm(h, sd, p("norm1"))
    q = t_linear(normed, sd, p("attn1.to_q"))
    k = t_linear(normed, sd, p("attn1.to_k"))
    v = t_linear(normed, sd, p("attn1.to_v"))
    h = h + t_linear(t_attention(q, k, v, heads, scale_q), sd, p("attn1.to_out.0"))

    normed = t_layer_norm(h, sd, p("norm2"))
    q = t_linear(normed, sd, p("attn2.to_q"))
    k = t_linear(ctx, sd, p("attn2.to_k"))
    v = t_linear(ctx, sd, p("attn2.to_v"))
    h = h + t_linear(t_attention(q, k, v, heads, scale_q), sd, p("attn2.to_out.0"))

    h = h + t_geglu_ff(t_layer_norm(h, sd, p("norm3")), sd, p("ff"))
    return h


def _block_spec(C, heads, cross_dim, prefix=""):
    p = lambda s: f"{prefix}{s}"
    return {
        p("norm1.weight"): (C,), p("norm1.bias"): (C,),
        p("attn1.to_q.weight"): (C, C), p("attn1.to_k.weight"): (C, C),
        p("attn1.to_v.weight"): (C, C),
        p("attn1.to_out.0.weight"): (C, C), p("attn1.to_out.0.bias"): (C,),
        p("norm2.weight"): (C,), p("norm2.bias"): (C,),
        p("attn2.to_q.weight"): (C, C),
        p("attn2.to_k.weight"): (C, cross_dim), p("attn2.to_v.weight"): (C, cross_dim),
        p("attn2.to_out.0.weight"): (C, C), p("attn2.to_out.0.bias"): (C,),
        p("norm3.weight"): (C,), p("norm3.bias"): (C,),
        p("ff.net.0.proj.weight"): (8 * C, C), p("ff.net.0.proj.bias"): (8 * C,),
        p("ff.net.2.weight"): (C, 4 * C), p("ff.net.2.bias"): (C,),
    }


def test_basic_transformer_block_matches_torch():
    from motionclone_tpu.models.attention import BasicTransformerBlock

    B, S, C, heads, cross_dim, ctx_len = 2, 12, 32, 4, 24, 7
    sd = make_sd(_block_spec(C, heads, cross_dim), seed=40)
    r = rng(41)
    h = randn(r, B, S, C)
    ctx = randn(r, B, ctx_len, cross_dim)

    expected = t_basic_transformer_block(
        torch.from_numpy(h), torch.from_numpy(ctx), sd, heads
    )

    m = BasicTransformerBlock(dim=C, heads=heads, dim_head=C // heads,
                              cross_attention_dim=cross_dim,
                              attention_impl="xla")
    params = flax_params(m, sd, jnp.asarray(h), jnp.asarray(ctx))
    got = m.apply(params, jnp.asarray(h), jnp.asarray(ctx))
    assert_close(got, expected, label="basic transformer block")


def t_spatial_transformer(x_t, sd, heads, groups, ctx):
    """Transformer3DModel forward, conv projections (reference
    attention.py:96-142): per-frame GN -> 1x1 conv proj_in -> block (context
    repeated per frame) -> 1x1 conv proj_out -> +residual.  ``x_t`` is
    (B, C, F, H, W); ``ctx`` is torch (B, L, D)."""
    f = x_t.shape[2]
    x2 = fold_bcfhw(x_t)
    bf, c, hh, ww = x2.shape
    residual = x2
    h = TF.group_norm(x2, groups, sd["norm.weight"], sd["norm.bias"], eps=1e-6)
    h = TF.conv2d(h, sd["proj_in.weight"], sd["proj_in.bias"])
    inner = h.shape[1]
    h = h.permute(0, 2, 3, 1).reshape(bf, hh * ww, inner)
    ctx_rep = ctx.repeat_interleave(f, dim=0)
    h = t_basic_transformer_block(h, ctx_rep, sd, heads,
                                  prefix="transformer_blocks.0.")
    h = h.reshape(bf, hh, ww, inner).permute(0, 3, 1, 2)
    h = TF.conv2d(h, sd["proj_out.weight"], sd["proj_out.bias"])
    return unfold_bcfhw(h + residual, f)


def test_spatial_transformer_matches_torch():
    from motionclone_tpu.models.attention import Transformer3DModel

    B, F_, H, W, C, heads, groups, cross_dim, ctx_len = 1, 3, 4, 4, 32, 4, 4, 24, 7
    spec = {"norm.weight": (C,), "norm.bias": (C,),
            "proj_in.weight": (C, C, 1, 1), "proj_in.bias": (C,),
            "proj_out.weight": (C, C, 1, 1), "proj_out.bias": (C,)}
    spec.update(_block_spec(C, heads, cross_dim, prefix="transformer_blocks.0."))
    sd = make_sd(spec, seed=50)
    r = rng(51)
    x = randn(r, B, F_, H, W, C)
    ctx = randn(r, B, ctx_len, cross_dim)

    expected = from_torch_video(
        t_spatial_transformer(to_torch_video(x), sd, heads, groups,
                              torch.from_numpy(ctx))
    )

    m = Transformer3DModel(heads=heads, dim_head=C // heads,
                           cross_attention_dim=cross_dim,
                           norm_num_groups=groups, attention_impl="xla")
    params = flax_params(m, sd, jnp.asarray(x), jnp.asarray(ctx))
    got = m.apply(params, jnp.asarray(x), jnp.asarray(ctx))
    assert_close(got, expected, label="spatial transformer")


# ---------------------------------------------------------------------------
# timestep embedding + DDIM step
# ---------------------------------------------------------------------------


def test_timestep_embedding_matches_torch():
    """diffusers get_timestep_embedding with SD1.5 settings (flip_sin_to_cos,
    downscale_freq_shift=0), used by reference unet.py:101-104."""
    from motionclone_tpu.models.embeddings import timestep_embedding

    dim = 32
    ts = torch.tensor([0.0, 1.0, 400.0, 999.0])
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = ts[:, None].float() * torch.exp(exponent)[None, :]
    expected = torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)

    got = timestep_embedding(jnp.asarray(ts.numpy()), dim)
    assert_close(got, expected, atol=1e-5, label="timestep embedding")


def t_customized_step(alphas_cumprod, final_alpha, eps_pred, timestep,
                      prev_timestep, sample, score=None, guidance_scale=1.0,
                      clip_sample=False, eta=0.0, variance_noise=None):
    """schedule_customized_step, epsilon prediction
    (reference motionclone_functions.py:326-409)."""
    a_t = alphas_cumprod[timestep]
    a_prev = alphas_cumprod[prev_timestep] if prev_timestep >= 0 else final_alpha
    beta_t = 1 - a_t
    x0 = (sample - beta_t**0.5 * eps_pred) / a_t**0.5
    if clip_sample:
        x0 = x0.clamp(-1, 1)
    variance = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    std_dev_t = eta * variance**0.5
    if score is not None and guidance_scale > 0.0:
        eps_pred = eps_pred - guidance_scale * (1 - a_t) ** 0.5 * score
    prev = a_prev**0.5 * x0 + (1 - a_prev - std_dev_t**2) ** 0.5 * eps_pred
    if eta > 0:
        prev = prev + std_dev_t * variance_noise
    return prev


@pytest.mark.parametrize("guided", [False, True])
@pytest.mark.parametrize("eta", [0.0, 0.3])
def test_ddim_step_matches_torch(guided, eta):
    from motionclone_tpu.config import NoiseScheduleConfig
    from motionclone_tpu.diffusion.ddim import ddim_step, make_ddim_params

    cfg = NoiseScheduleConfig()
    params = make_ddim_params(cfg)
    # the reference schedule in torch float64->float32, like diffusers
    betas = torch.linspace(cfg.beta_start, cfg.beta_end, 1000, dtype=torch.float64)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0).float()

    r = rng(60)
    sample = torch.from_numpy(randn(r, 1, 4, 2, 8, 8))
    eps_pred = torch.from_numpy(randn(r, 1, 4, 2, 8, 8))
    score = torch.from_numpy(randn(r, 1, 4, 2, 8, 8, scale=0.1)) if guided else None
    noise = torch.from_numpy(randn(r, 1, 4, 2, 8, 8)) if eta > 0 else None
    t, t_prev = 981, 967

    expected = t_customized_step(
        alphas_cumprod, torch.tensor(1.0), eps_pred, t, t_prev, sample,
        score=score, eta=eta, variance_noise=noise,
    )
    got = ddim_step(
        params, jnp.asarray(eps_pred.numpy()), t, t_prev,
        jnp.asarray(sample.numpy()),
        score=jnp.asarray(score.numpy()) if guided else None,
        eta=eta,
        variance_noise=jnp.asarray(noise.numpy()) if eta > 0 else None,
    )
    assert_close(got, expected, label=f"ddim step guided={guided} eta={eta}")

    # final step: prev_timestep -1 -> final_alpha_cumprod (set_alpha_to_one)
    expected_last = t_customized_step(
        alphas_cumprod, torch.tensor(1.0), eps_pred, 7, -1, sample, score=score
    )
    got_last = ddim_step(
        params, jnp.asarray(eps_pred.numpy()), 7, -1, jnp.asarray(sample.numpy()),
        score=jnp.asarray(score.numpy()) if guided else None,
    )
    assert_close(got_last, expected_last, label="ddim final step")


def test_add_noise_matches_torch():
    """add_noise (reference motionclone_functions.py:19-23)."""
    from motionclone_tpu.config import NoiseScheduleConfig
    from motionclone_tpu.diffusion.ddim import add_noise, make_ddim_params

    cfg = NoiseScheduleConfig()
    params = make_ddim_params(cfg)
    betas = torch.linspace(cfg.beta_start, cfg.beta_end, 1000, dtype=torch.float64)
    alphas_cumprod = torch.cumprod(1.0 - betas, dim=0).float()

    r = rng(70)
    x0 = torch.from_numpy(randn(r, 1, 4, 2, 6, 6))
    noise = torch.from_numpy(randn(r, 1, 4, 2, 6, 6))
    t = 400
    expected = alphas_cumprod[t] ** 0.5 * x0 + (1 - alphas_cumprod[t]) ** 0.5 * noise
    got = add_noise(params, t, jnp.asarray(x0.numpy()), jnp.asarray(noise.numpy()))
    assert_close(got, expected, label="add_noise")
