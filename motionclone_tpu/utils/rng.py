"""Domain-separated PRNG keys for the per-example seed.

The reference draws every noise tensor from one advancing torch.Generator
(t2v_video_sample.py:85-95), so successive draws differ by generator
*state*.  ``jax.random.PRNGKey(seed)`` has no state: two draws with the
same key and shape are bitwise identical.  Without separation, the VAE
posterior draw, the extraction add-noise draw, and the initial sampling
latents (all shaped ``(1, F, h, w, 4)``) would be the *same array*,
correlating noises the reference keeps independent.

Each consumer folds a fixed domain tag into the example seed instead —
the standard JAX stream-splitting idiom (SURVEY §2.4: parity target is
distributional, not bitwise).
"""

import jax

# fold_in tags, one per independent noise consumer
VAE_POSTERIOR = 1       # reference-video VAE encode posterior draw
EXTRACT_NOISE = 2       # add_noise eps during motion-rep extraction
INIT_LATENTS = 3        # initial sampling latents (prepare_latents)
CN_IMAGE_POSTERIOR = 4  # condition-image VAE posterior draw (i2v)


def seed_key(seed: int, domain: int) -> jax.Array:
    """An independent PRNG key for ``domain`` derived from the example seed."""
    return jax.random.fold_in(jax.random.PRNGKey(seed), domain)
