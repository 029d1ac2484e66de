"""UNet3D structural tests on a tiny config (CPU-fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.config import tiny_unet_config
from motionclone_tpu.models.unet3d import UNet3DConditionModel

B, F, H, W = 1, 4, 16, 16


@pytest.fixture(scope="module")
def unet_and_params():
    cfg = tiny_unet_config()
    model = UNet3DConditionModel(cfg=cfg, guidance_blocks=("up_blocks.1",))
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 77, cfg.cross_attention_dim))
    params = model.init(rng, sample, jnp.array([1]), ctx)
    return model, params, cfg


def test_forward_shapes_and_probs(unet_and_params):
    model, params, cfg = unet_and_params
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)
    out, probs = model.apply(params, sample, jnp.array([500]), ctx)
    assert out.shape == (B, F, H, W, 4)
    # up_blocks.1 has layers_per_block+1 = 2 motion modules x 2 attention blocks
    assert len(probs) == 4
    for key, p in probs.items():
        assert key.startswith("up_blocks.1.motion_modules.")
        assert ".temporal_transformer.transformer_blocks.0.attention_blocks." in key
        # (B, S, heads, F, F); up_blocks.1 runs at H/4 x W/4 for this 4-level net
        assert p.shape[0] == B and p.shape[2] == 2 and p.shape[3:] == (F, F)
        # probability rows sum to one
        np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)


def test_extraction_early_exit(unet_and_params):
    model, params, cfg = unet_and_params
    rng = np.random.default_rng(1)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)
    out, probs = model.apply(params, sample, jnp.array([400]), ctx, max_up_block=1)
    assert out is None
    assert len(probs) == 4
    # probs must match the full forward exactly (same computation prefix)
    _, probs_full = model.apply(params, sample, jnp.array([400]), ctx)
    for k in probs:
        np.testing.assert_allclose(
            np.asarray(probs[k]), np.asarray(probs_full[k]), rtol=1e-6
        )


def test_zero_init_motion_module_params(unet_and_params):
    """zero_initialize=True zeroes every temporal proj_out (motion_module.py:77-78)."""
    _, params, _ = unet_and_params
    found = 0

    def walk(tree, path=""):
        nonlocal found
        for k, v in tree.items():
            p = f"{path}/{k}"
            if isinstance(v, dict):
                walk(v, p)
            elif "temporal_transformer" in p and "/proj_out/" in p:
                assert np.all(np.asarray(v) == 0), p
                found += 1

    walk(params["params"])
    assert found >= 2  # kernel+bias of at least one motion module


def test_grad_flows_from_probs_to_sample(unet_and_params):
    """The guidance gradient path: d(loss(probs)) / d(latents) is nonzero."""
    model, params, cfg = unet_and_params
    rng = np.random.default_rng(2)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)

    def loss_fn(s):
        _, probs = model.apply(params, s, jnp.array([500]), ctx, max_up_block=1)
        return sum(jnp.sum(p**2) for p in probs.values())

    g = jax.grad(loss_fn)(sample)
    assert g.shape == sample.shape
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_controlnet_residual_injection(unet_and_params):
    model, params, cfg = unet_and_params
    rng = np.random.default_rng(3)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)
    out0, _ = model.apply(params, sample, jnp.array([500]), ctx)
    # 1 conv_in + 4 blocks: 3 blocks contribute layers+downsample, final no ds
    # layers_per_block=1 -> skips: 1 + (1+1)*3 + 1 = 8
    n_skips = 1 + (1 + 1) * 3 + 1
    down_res = tuple(
        jnp.zeros((1, 1, 1, 1, 1)) for _ in range(n_skips)
    )  # broadcastable zeros: no-op
    mid_res = jnp.zeros((1, 1, 1, 1, 1))
    out1, _ = model.apply(
        params, sample, jnp.array([500]), ctx,
        down_block_residuals=down_res, mid_block_residual=mid_res,
    )
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)
    # nonzero mid residual changes the output
    out2, _ = model.apply(
        params, sample, jnp.array([500]), ctx,
        mid_block_residual=jnp.ones((1, 1, 1, 1, 1)),
    )
    assert np.abs(np.asarray(out2) - np.asarray(out0)).max() > 1e-4


def test_no_guidance_blocks_returns_empty_probs():
    cfg = tiny_unet_config()
    model = UNet3DConditionModel(cfg=cfg, guidance_blocks=())
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((B, F, H, W, 4))
    ctx = jnp.zeros((B, 77, cfg.cross_attention_dim))
    params = model.init(rng, sample, jnp.array([1]), ctx)
    out, probs = model.apply(params, sample, jnp.array([1]), ctx)
    assert out.shape == (B, F, H, W, 4)
    assert probs == {}


def test_post_guidance_cut_preserves_values_and_grads(unet_and_params):
    """post_guidance_cut stop-gradients the tail up blocks without changing
    the noise prediction, the guidance loss, or its latent gradient
    (reference's no_grad split, motionclone_functions.py:629-652)."""
    model, params, cfg = unet_and_params
    split_model = UNet3DConditionModel(
        cfg=cfg, guidance_blocks=("up_blocks.1",),
        post_guidance_cut=1, post_guidance_impl="xla",
    )
    rng = np.random.default_rng(2)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), dtype=jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)

    def loss_fn(m, lat):
        pred, probs = m.apply(params, lat, jnp.array([500]), ctx)
        loss = sum(jnp.sum(jnp.square(p)) for p in probs.values())
        return loss, pred

    (l_ref, pred_ref), g_ref = jax.value_and_grad(
        lambda lat: loss_fn(model, lat), has_aux=True
    )(sample)
    (l_cut, pred_cut), g_cut = jax.value_and_grad(
        lambda lat: loss_fn(split_model, lat), has_aux=True
    )(sample)
    np.testing.assert_allclose(np.asarray(l_cut), np.asarray(l_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pred_cut), np.asarray(pred_ref), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_cut), np.asarray(g_ref), atol=1e-5, rtol=1e-5
    )


def test_mid_block_motion_module_forward():
    """inference-v2.yaml sets motion_module_mid_block: true — the mid block
    gains its own temporal module (reference unet.py:157,236 topology +
    configs/model_config/inference-v2.yaml).  Exercise the forward and the
    parameter topology, not just config parsing."""
    import dataclasses

    cfg = dataclasses.replace(tiny_unet_config(), motion_module_mid_block=True)
    model = UNet3DConditionModel(cfg=cfg, guidance_blocks=("up_blocks.1",))
    rng = np.random.default_rng(4)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    flat = jax.tree_util.tree_leaves_with_path(params)
    mid_mm = [p for p, _ in flat if "mid_block" in str(p) and "motion_modules" in str(p)]
    assert mid_mm, "mid block should own motion-module parameters"

    out, probs = model.apply(params, sample, jnp.array([500]), ctx)
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()
    # guidance blocks unchanged: probs still come from up_blocks.1 only
    assert all(k.startswith("up_blocks.1.") for k in probs)

    # the zero-initialized mid temporal module is an identity at init: same
    # output as the mid-block-free topology with the shared parameters
    base = UNet3DConditionModel(
        cfg=tiny_unet_config(), guidance_blocks=("up_blocks.1",)
    )
    base_params = base.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    out_base, _ = base.apply(base_params, sample, jnp.array([500]), ctx)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_base), atol=1e-5, rtol=1e-5
    )


def test_non_inflated_groupnorm_forward():
    """use_inflated_groupnorm=false (reference resnet.py:21-29 vs plain
    nn.GroupNorm over b c f h w): statistics span frames, so permuting the
    frame order must change per-frame outputs — and the forward stays
    finite."""
    import dataclasses

    cfg = dataclasses.replace(tiny_unet_config(), use_inflated_groupnorm=False)
    model = UNet3DConditionModel(cfg=cfg, guidance_blocks=())
    rng = np.random.default_rng(5)
    sample = jnp.asarray(rng.normal(size=(B, F, H, W, 4)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, 77, cfg.cross_attention_dim)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    out, _ = model.apply(params, sample, jnp.array([500]), ctx)
    assert out.shape == (B, F, H, W, 4)
    assert np.isfinite(np.asarray(out)).all()

    # inflated (per-frame) stats: frame 0's output is independent of other
    # frames' content before any temporal mixing happens — compare the two
    # modes on a frame-permuted copy where only frames 1.. change
    inflated = UNet3DConditionModel(
        cfg=tiny_unet_config(), guidance_blocks=()
    )
    iparams = inflated.init(jax.random.PRNGKey(0), sample, jnp.array([1]), ctx)
    sample2 = sample.at[:, 1:].multiply(3.0)
    a, _ = inflated.apply(iparams, sample, jnp.array([500]), ctx)
    b, _ = inflated.apply(iparams, sample2, jnp.array([500]), ctx)
    # temporal attention mixes frames in both modes, so outputs always
    # differ; the *norm statistics* difference shows up as a much larger
    # frame-0 delta in the non-inflated mode
    c, _ = model.apply(params, sample, jnp.array([500]), ctx)
    d, _ = model.apply(params, sample2, jnp.array([500]), ctx)
    delta_inflated = float(jnp.abs(a[:, 0] - b[:, 0]).mean())
    delta_global = float(jnp.abs(c[:, 0] - d[:, 0]).mean())
    assert delta_global > delta_inflated
