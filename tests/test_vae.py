"""VAE structural tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.models.vae import (
    AutoencoderKL,
    sample_latents,
    tiny_vae_config,
)


def _init(cfg):
    model = AutoencoderKL(cfg=cfg)
    x = jnp.zeros((1, 2, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_encode_decode_shapes():
    cfg = tiny_vae_config()
    model, params = _init(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 2, 16, 16, 3)), jnp.float32)
    mean, logvar = model.apply(params, x, method=model.encode)
    # 2 blocks -> one downsample -> 8x8 latents
    assert mean.shape == (1, 2, 8, 8, cfg.latent_channels)
    assert logvar.shape == mean.shape
    z = sample_latents(mean, logvar, jax.random.PRNGKey(1))
    out = model.apply(params, z, method=model.decode)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_frames_processed_independently():
    """Folding frames into batch must equal per-frame application
    (the reference decodes frame-by-frame, pipeline_animation.py:256-257)."""
    cfg = tiny_vae_config()
    model, params = _init(cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, size=(1, 3, 16, 16, 3)), jnp.float32)
    mean_all, _ = model.apply(params, x, method=model.encode)
    for f in range(3):
        mean_f, _ = model.apply(params, x[:, f : f + 1], method=model.encode)
        np.testing.assert_allclose(
            np.asarray(mean_all[:, f]), np.asarray(mean_f[:, 0]), atol=1e-5
        )


def test_posterior_sampling_statistics():
    mean = jnp.zeros((1, 1, 4, 4, 2))
    logvar = jnp.zeros((1, 1, 4, 4, 2))  # std == 1
    draws = np.stack(
        [
            np.asarray(sample_latents(mean, logvar, jax.random.PRNGKey(i)))
            for i in range(200)
        ]
    )
    assert abs(draws.mean()) < 0.05
    assert abs(draws.std() - 1.0) < 0.05
