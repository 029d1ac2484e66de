"""Top-1 sparsification, gather-MSE loss, ramps
(oracle: motionclone_functions.py:79, 85-100, 228-234)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motionclone_tpu.diffusion.guidance import (
    gather_sparse_probs,
    load_motion_representation,
    motion_guidance_loss,
    ramp_scales,
    save_motion_representation,
    sparsify_top1,
)


def _softmax_probs(rng, shape):
    logits = rng.normal(size=shape).astype(np.float32)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def test_sparsify_top1_matches_numpy(rng):
    probs = jnp.asarray(_softmax_probs(rng, (2, 3, 16, 16)))
    values, indices = sparsify_top1(probs)
    assert values.shape == (2, 3, 16, 1) and values.dtype == jnp.float32
    assert indices.shape == (2, 3, 16, 1) and indices.dtype == jnp.uint8
    np.testing.assert_allclose(
        np.asarray(values)[..., 0], np.asarray(probs).max(-1), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(indices)[..., 0], np.asarray(probs).argmax(-1)
    )


def test_gather_roundtrip(rng):
    probs = jnp.asarray(_softmax_probs(rng, (4, 2, 8, 8)))
    values, indices = sparsify_top1(probs)
    picked = gather_sparse_probs(probs, indices)
    np.testing.assert_allclose(np.asarray(picked), np.asarray(values), rtol=1e-6)


def test_loss_zero_at_reference_and_positive_away(rng):
    probs = {"m0": jnp.asarray(_softmax_probs(rng, (2, 4, 16, 16)))}
    rep = {"m0": sparsify_top1(probs["m0"])}
    assert float(motion_guidance_loss(probs, rep)) == pytest.approx(0.0, abs=1e-12)
    other = {"m0": jnp.asarray(_softmax_probs(rng, (2, 4, 16, 16)))}
    assert float(motion_guidance_loss(other, rep)) > 0


def test_loss_is_sum_of_per_module_means(rng):
    p1 = jnp.asarray(_softmax_probs(rng, (1, 2, 4, 4)))
    p2 = jnp.asarray(_softmax_probs(rng, (1, 2, 4, 4)))
    rep = {"a": sparsify_top1(p2), "b": sparsify_top1(p2)}
    cur = {"a": p1, "b": p1}
    picked = np.asarray(gather_sparse_probs(p1, rep["a"][1]))
    target = np.asarray(rep["a"][0])
    per_module = ((picked - target) ** 2).mean()
    assert float(motion_guidance_loss(cur, rep)) == pytest.approx(
        2 * per_module, rel=1e-5
    )


def test_loss_differentiable(rng):
    probs = jnp.asarray(_softmax_probs(rng, (1, 2, 8, 8)))
    rep = {"m": sparsify_top1(jnp.asarray(_softmax_probs(rng, (1, 2, 8, 8))))}

    def f(p):
        return motion_guidance_loss({"m": p}, rep)

    g = jax.grad(f)(probs)
    assert g.shape == probs.shape
    # gradient is nonzero exactly at the gathered positions
    assert np.count_nonzero(np.asarray(g)) == 1 * 2 * 8  # one per attention row


def test_ramp_scales_t2v_camera():
    """guidance=50, warm=10, cool=10 (configs/t2v_camera.yaml:12-14)."""
    s = ramp_scales(50, 10, 10)
    assert s.shape == (50,)
    # warm-up ramp: (i+1)/10 for i<10 (motionclone_functions.py:228-230)
    np.testing.assert_allclose(s[:10], (np.arange(10) + 1) / 10)
    # plateau
    np.testing.assert_allclose(s[10:41], 1.0)
    # cool-down: (50-i)/10 for i>40 (motionclone_functions.py:232-234)
    np.testing.assert_allclose(s[41:], (50 - np.arange(41, 50)) / 10)


def test_motion_representation_roundtrip(tmp_path, rng):
    probs = jnp.asarray(_softmax_probs(rng, (1, 4, 16, 16)))
    rep = {"up_blocks.1.motion_modules.0.ta.0": sparsify_top1(probs)}
    path = str(tmp_path / "rep.npz")
    save_motion_representation(path, rep)
    loaded = load_motion_representation(path)
    assert set(loaded) == set(rep)
    v, i = loaded["up_blocks.1.motion_modules.0.ta.0"]
    np.testing.assert_allclose(v, np.asarray(rep["up_blocks.1.motion_modules.0.ta.0"][0]))
    np.testing.assert_array_equal(i, np.asarray(rep["up_blocks.1.motion_modules.0.ta.0"][1]))
    assert i.dtype == np.uint8


def test_reference_pt_interop(tmp_path, rng):
    """Reference-format torch .pt payloads load as drop-in representations.

    The reference persists {name: [values, indices_uint8]} with arrays
    shaped (batch*pixels, heads, frames, 1) (motionclone_functions.py:79-81);
    our in-memory layout is (batch, pixels, heads, frames, 1).
    """
    torch = pytest.importorskip("torch")
    b, s, heads, f = 1, 6, 2, 4
    values = rng.uniform(0.2, 0.9, size=(b * s, heads, f, 1)).astype(np.float32)
    indices = rng.integers(0, f, size=(b * s, heads, f, 1)).astype(np.uint8)
    path = str(tmp_path / "ref.pt")
    # exactly as the reference writes it: a dict of [tensor, tensor] lists,
    # values in the compute dtype (fp16 there)
    torch.save(
        {"up_blocks.1.mm": [
            torch.from_numpy(values).to(torch.float16),
            torch.from_numpy(indices),
        ]},
        path,
    )

    rep = load_motion_representation(path)
    v, i = rep["up_blocks.1.mm"]
    assert v.shape == (b, s, heads, f, 1) and i.shape == (b, s, heads, f, 1)
    assert v.dtype == np.float32 and i.dtype == np.uint8
    np.testing.assert_allclose(
        v.reshape(b * s, heads, f, 1), values, atol=5e-4
    )
    np.testing.assert_array_equal(i.reshape(b * s, heads, f, 1), indices)


def test_pt_save_load_roundtrip(tmp_path, rng):
    """Saving to .pt produces a payload the reference's loader shape expects,
    and it round-trips through our own loader exactly."""
    torch = pytest.importorskip("torch")
    probs = jnp.asarray(_softmax_probs(rng, (1, 6, 2, 4, 4)))
    rep = {"up_blocks.1.motion_modules.0.ta.0": sparsify_top1(probs)}
    path = str(tmp_path / "rep.pt")
    save_motion_representation(path, rep)

    # reference-side view: torch.load gives (b*s, heads, f, 1) tensors
    payload = torch.load(path, map_location="cpu", weights_only=True)
    tv, ti = payload["up_blocks.1.motion_modules.0.ta.0"]
    assert tuple(tv.shape) == (6, 2, 4, 1)
    assert ti.dtype == torch.uint8

    loaded = load_motion_representation(path)
    v, i = loaded["up_blocks.1.motion_modules.0.ta.0"]
    np.testing.assert_array_equal(
        v, np.asarray(rep["up_blocks.1.motion_modules.0.ta.0"][0])
    )
    np.testing.assert_array_equal(
        i, np.asarray(rep["up_blocks.1.motion_modules.0.ta.0"][1])
    )
