"""Whole-VAE torch oracle + LDM VAE weight-path oracle.

The VAE decode is the last compute between latents and the scored output
(reference pipeline_animation.py:249-263 runs diffusers' ``AutoencoderKL``
per frame), yet until this file its numerics had no cross-implementation
check.  Here the diffusers AutoencoderKL math (reference consumes it at
t2v_video_sample.py:25) is re-rolled as a *functional torch network* —
resnet blocks, the single-head mid attention, asymmetric-padded
downsampling, nearest-up + conv upsampling, quant convs — driven from one
synthetic diffusers-layout state dict.  The same dict goes through the
production conversion path (``weights.load.vae_params_from_state_dict``)
and encode posterior moments / decode outputs must agree.

The LDM path (``convert_ldm_vae``, reference
convert_from_ckpt.py:559-663) is oracle-checked separately: an LDM-layout
(first_stage_model.*) dict is synthesized FROM the diffusers one —
attention projections as 1x1 convs, ``nin_shortcut`` naming, bottom-up
decoder indexing — and the converter must reproduce the diffusers dict
bit-exactly, including the 1x1-conv->dense attention reshape
(weights/ldm.py:158-168), SURVEY §7's #1-ranked silent-error risk.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as TF

from test_torch_oracle_unet import synth_scaled_sd

from motionclone_tpu.models.vae import (
    AutoencoderKL,
    VAEConfig,
    tiny_vae_config,
)
from motionclone_tpu.weights.ldm import convert_ldm_vae
from motionclone_tpu.weights.load import vae_params_from_state_dict


# ---------------------------------------------------------------------------
# hand-rolled functional torch AutoencoderKL (diffusers vae.py semantics)
# ---------------------------------------------------------------------------


def _w(sd, key):
    return torch.tensor(np.asarray(sd[key], dtype=np.float32))


def t_conv(sd, prefix, x, stride=1, padding=1):
    return TF.conv2d(
        x, _w(sd, prefix + ".weight"), _w(sd, prefix + ".bias"),
        stride=stride, padding=padding,
    )


def t_gn(sd, prefix, x, groups):
    return TF.group_norm(
        x, groups, _w(sd, prefix + ".weight"), _w(sd, prefix + ".bias"),
        eps=1e-6,
    )


def t_resnet(sd, prefix, x, groups):
    h = TF.silu(t_gn(sd, prefix + ".norm1", x, groups))
    h = t_conv(sd, prefix + ".conv1", h)
    h = TF.silu(t_gn(sd, prefix + ".norm2", h, groups))
    h = t_conv(sd, prefix + ".conv2", h)
    if prefix + ".conv_shortcut.weight" in sd:
        x = t_conv(sd, prefix + ".conv_shortcut", x, padding=0)
    return x + h


def t_attn(sd, prefix, x, groups):
    """Single-head full-channel spatial self-attention (diffusers VAE mid
    attention; projections are Linear in the modern key layout)."""
    B, C, H, W = x.shape
    y = t_gn(sd, prefix + ".group_norm", x, groups)
    y = y.reshape(B, C, H * W).permute(0, 2, 1)  # (B, HW, C)
    q = TF.linear(y, _w(sd, prefix + ".to_q.weight"), _w(sd, prefix + ".to_q.bias"))
    k = TF.linear(y, _w(sd, prefix + ".to_k.weight"), _w(sd, prefix + ".to_k.bias"))
    v = TF.linear(y, _w(sd, prefix + ".to_v.weight"), _w(sd, prefix + ".to_v.bias"))
    probs = torch.softmax(q @ k.transpose(1, 2) * C ** -0.5, dim=-1)
    out = TF.linear(
        probs @ v,
        _w(sd, prefix + ".to_out.0.weight"), _w(sd, prefix + ".to_out.0.bias"),
    )
    return x + out.permute(0, 2, 1).reshape(B, C, H, W)


def t_downsample(sd, prefix, x):
    # diffusers' asymmetric (0,1) pad: right/bottom only, then stride-2
    x = TF.pad(x, (0, 1, 0, 1))
    return t_conv(sd, prefix + ".conv", x, stride=2, padding=0)


def t_upsample(sd, prefix, x):
    x = TF.interpolate(x, scale_factor=2.0, mode="nearest")
    return t_conv(sd, prefix + ".conv", x)


def t_encode(sd, cfg, x):
    """(B, 3, H, W) pixels -> (mean, logvar) each (B, latent, h, w)."""
    g = cfg.norm_num_groups
    n = len(cfg.block_out_channels)
    x = t_conv(sd, "encoder.conv_in", x)
    for i in range(n):
        for j in range(cfg.layers_per_block):
            x = t_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", x, g)
        if i < n - 1:
            x = t_downsample(sd, f"encoder.down_blocks.{i}.downsamplers.0", x)
    x = t_resnet(sd, "encoder.mid_block.resnets.0", x, g)
    x = t_attn(sd, "encoder.mid_block.attentions.0", x, g)
    x = t_resnet(sd, "encoder.mid_block.resnets.1", x, g)
    x = TF.silu(t_gn(sd, "encoder.conv_norm_out", x, g))
    x = t_conv(sd, "encoder.conv_out", x)
    moments = t_conv(sd, "quant_conv", x, padding=0)
    return torch.chunk(moments, 2, dim=1)


def t_decode(sd, cfg, z):
    """(B, latent, h, w) -> (B, 3, H, W) pixels."""
    g = cfg.norm_num_groups
    rev = list(reversed(cfg.block_out_channels))
    x = t_conv(sd, "post_quant_conv", z, padding=0)
    x = t_conv(sd, "decoder.conv_in", x)
    x = t_resnet(sd, "decoder.mid_block.resnets.0", x, g)
    x = t_attn(sd, "decoder.mid_block.attentions.0", x, g)
    x = t_resnet(sd, "decoder.mid_block.resnets.1", x, g)
    for i in range(len(rev)):
        for j in range(cfg.layers_per_block + 1):
            x = t_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", x, g)
        if i < len(rev) - 1:
            x = t_upsample(sd, f"decoder.up_blocks.{i}.upsamplers.0", x)
    x = TF.silu(t_gn(sd, "decoder.conv_norm_out", x, g))
    return t_conv(sd, "decoder.conv_out", x)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _synth_vae(cfg, seed=0):
    """Fan-in-scaled diffusers-layout state dict covering our flax tree."""
    model = AutoencoderKL(cfg=cfg)
    import jax

    x0 = jnp.zeros((1, 1, 16, 16, cfg.in_channels))
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x0))
    return synth_scaled_sd(shapes, seed)


def _run_both(cfg, size, frames=2, seed=0, atol=3e-5):
    sd = _synth_vae(cfg, seed)
    params = vae_params_from_state_dict(sd, cfg)
    model = AutoencoderKL(cfg=cfg)

    r = np.random.default_rng(seed + 100)
    px = r.uniform(-1, 1, size=(1, frames, size, size, cfg.in_channels))
    px = np.asarray(px, np.float32)

    mean, logvar = model.apply(params, jnp.asarray(px), method=model.encode)
    tx = torch.tensor(px[0]).permute(0, 3, 1, 2)  # frames fold into batch
    with torch.no_grad():
        t_mean, t_logvar = t_encode(sd, cfg, tx)
    np.testing.assert_allclose(
        np.asarray(mean[0]), t_mean.permute(0, 2, 3, 1).numpy(),
        atol=atol, rtol=2e-4, err_msg="posterior mean",
    )
    np.testing.assert_allclose(
        np.asarray(logvar[0]), t_logvar.permute(0, 2, 3, 1).numpy(),
        atol=atol, rtol=2e-4, err_msg="posterior logvar",
    )

    lat = cfg.latent_channels
    h = size // 2 ** (len(cfg.block_out_channels) - 1)
    z = np.asarray(r.standard_normal((1, frames, h, h, lat)), np.float32)
    out = model.apply(params, jnp.asarray(z), method=model.decode)
    with torch.no_grad():
        t_out = t_decode(sd, cfg, torch.tensor(z[0]).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out[0]), t_out.permute(0, 2, 3, 1).numpy(),
        atol=atol, rtol=2e-4, err_msg="decode",
    )


def test_vae_oracle_tiny():
    _run_both(tiny_vae_config(), size=16)


def test_vae_oracle_three_level():
    """Three resolution levels + channel growth: exercises >1 downsampler /
    upsampler and a conv_shortcut in both coders."""
    cfg = VAEConfig(
        block_out_channels=(8, 12, 16), layers_per_block=1, norm_num_groups=4
    )
    _run_both(cfg, size=32)


@pytest.mark.slow
def test_vae_oracle_production_channels():
    """Full SD1.5 topology (128..512 channels, 4 levels, 2 layers/block) on
    a small spatial slice — the production numerics path, not just shapes."""
    _run_both(VAEConfig(), size=32, frames=1, atol=3e-4)


# ---------------------------------------------------------------------------
# LDM-key path: synthesize first_stage_model.* from the diffusers dict and
# require the converter to reproduce the diffusers dict bit-exactly
# ---------------------------------------------------------------------------

_RES_INV = {
    "norm1": "norm1", "conv1": "conv1", "norm2": "norm2", "conv2": "conv2",
    "conv_shortcut": "nin_shortcut",
}
_ATTN_INV = {
    "group_norm": "norm", "to_q": "q", "to_k": "k", "to_v": "v",
    "to_out.0": "proj_out",
}


def _ldm_from_diffusers(sd, cfg):
    n = len(cfg.block_out_channels)
    out = {}

    def put(ldm_key, diff_key):
        out["first_stage_model." + ldm_key] = sd[diff_key]

    for coder in ("encoder", "decoder"):
        for leaf in ("weight", "bias"):
            put(f"{coder}.conv_in.{leaf}", f"{coder}.conv_in.{leaf}")
            put(f"{coder}.conv_out.{leaf}", f"{coder}.conv_out.{leaf}")
            put(f"{coder}.norm_out.{leaf}", f"{coder}.conv_norm_out.{leaf}")
        for b, (src, dst) in enumerate([("mid.block_1", "mid_block.resnets.0"),
                                        ("mid.block_2", "mid_block.resnets.1")]):
            for d_name, l_name in _RES_INV.items():
                for leaf in ("weight", "bias"):
                    k = f"{coder}.{dst}.{d_name}.{leaf}"
                    if k in sd:
                        put(f"{coder}.{src}.{l_name}.{leaf}", k)
        for d_name, l_name in _ATTN_INV.items():
            for leaf in ("weight", "bias"):
                k = f"{coder}.mid_block.attentions.0.{d_name}.{leaf}"
                if k not in sd:
                    continue
                v = sd[k]
                if d_name != "group_norm" and leaf == "weight":
                    v = v.reshape(v.shape[0], v.shape[1], 1, 1)  # dense -> 1x1
                out[f"first_stage_model.{coder}.mid.attn_1.{l_name}.{leaf}"] = v

    for leaf in ("weight", "bias"):
        put(f"quant_conv.{leaf}", f"quant_conv.{leaf}")
        put(f"post_quant_conv.{leaf}", f"post_quant_conv.{leaf}")

    for i in range(n):
        for j in range(cfg.layers_per_block):
            for d_name, l_name in _RES_INV.items():
                for leaf in ("weight", "bias"):
                    k = f"encoder.down_blocks.{i}.resnets.{j}.{d_name}.{leaf}"
                    if k in sd:
                        put(f"encoder.down.{i}.block.{j}.{l_name}.{leaf}", k)
        if i < n - 1:
            for leaf in ("weight", "bias"):
                put(
                    f"encoder.down.{i}.downsample.conv.{leaf}",
                    f"encoder.down_blocks.{i}.downsamplers.0.conv.{leaf}",
                )

    # LDM decoder indexes bottom-up: ldm up.{i} == diffusers up_blocks.{n-1-i}
    for i in range(n):
        dst = n - 1 - i
        for j in range(cfg.layers_per_block + 1):
            for d_name, l_name in _RES_INV.items():
                for leaf in ("weight", "bias"):
                    k = f"decoder.up_blocks.{dst}.resnets.{j}.{d_name}.{leaf}"
                    if k in sd:
                        put(f"decoder.up.{i}.block.{j}.{l_name}.{leaf}", k)
        if dst < n - 1:
            for leaf in ("weight", "bias"):
                put(
                    f"decoder.up.{i}.upsample.conv.{leaf}",
                    f"decoder.up_blocks.{dst}.upsamplers.0.conv.{leaf}",
                )
    return out


@pytest.mark.parametrize(
    "cfg",
    [
        tiny_vae_config(),
        dataclasses.replace(
            tiny_vae_config(), block_out_channels=(8, 12, 16)
        ),
    ],
    ids=["two_level", "three_level"],
)
def test_convert_ldm_vae_roundtrip(cfg):
    sd = _synth_vae(cfg)
    ldm = _ldm_from_diffusers(sd, cfg)
    back = convert_ldm_vae(ldm)
    assert set(back) == set(sd), (
        f"missing={sorted(set(sd) - set(back))[:5]} "
        f"extra={sorted(set(back) - set(sd))[:5]}"
    )
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    # and the converted dict loads through the production path
    params = vae_params_from_state_dict(back, cfg)
    model = AutoencoderKL(cfg=cfg)
    z = jnp.zeros((1, 1, 8, 8, cfg.latent_channels))
    out = model.apply(params, z, method=model.decode)
    assert np.isfinite(np.asarray(out)).all()
