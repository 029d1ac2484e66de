"""run_example orchestration test (reference t2v_video_sample.py:75-105).

Drives :meth:`MotionCloneRuntime.run_example` with the compute surfaces
stubbed out, verifying the host-side flow end to end: video preprocessing,
motion-representation disk caching, per-phase logging, and the reference's
output-file naming.  Full-model coverage of the compute calls lives in
test_pipeline_tiny.py; this covers the glue that no other test touches.
"""

import os
from types import SimpleNamespace

import numpy as np

from motionclone_tpu.config import Example, InferenceConfig
from motionclone_tpu.io.video import write_video
from motionclone_tpu.pipeline.runner import MotionCloneRuntime


def _stub_runtime(calls):
    rt = object.__new__(MotionCloneRuntime)
    rt.infer_cfg = InferenceConfig(
        height=32, width=32, video_length=4, inference_steps=5, guidance_steps=2
    )
    rt.cn_cfg = None
    rt.encode_video = lambda video, seed: np.zeros((1, 4, 4, 4, 4), np.float32)
    rt.encode_prompt = lambda p, n="": (
        np.zeros((1, 77, 8), np.float32),
        np.ones((1, 77, 8), np.float32),
    )
    # (b, s, heads, F, 1) with F == the stub config's video_length
    rep = {"up_blocks.1.motion_modules.0": (
        np.ones((1, 4, 2, 4, 1), np.float32),
        np.zeros((1, 4, 2, 4, 1), np.uint8),
    )}

    def extract(video_latents, uncond_emb, seed, cn_cond=None):
        calls.append("extract")
        return rep

    def sample(uncond_emb, cond_emb, rep_in, seed, cn_cond=None,
               resume_path=None, on_chunk=None):
        calls.append("sample")
        assert set(rep_in) == set(rep)
        return np.zeros((1, 4, 4, 4, 4), np.float32)

    rt.pipeline = SimpleNamespace(
        extract_motion_representation=extract, sample_latents=sample
    )
    rt.decode_latents = lambda latents: np.zeros((4, 32, 32, 3), np.uint8)
    return rt


def test_run_example_flow_and_caching(tmp_path, capsys):
    frames = np.random.default_rng(0).integers(
        0, 255, size=(6, 32, 32, 3), dtype=np.uint8
    )
    src = str(tmp_path / "ref.mp4")
    write_video(src, frames, fps=8)

    calls = []
    rt = _stub_runtime(calls)
    ex = Example(video_path="ref.mp4", new_prompt="a cat", seed=7)
    out = rt.run_example(
        ex,
        motion_rep_dir=str(tmp_path / "reps"),
        output_dir=str(tmp_path / "out"),
        config_root=str(tmp_path),
    )
    # reference naming: <stem>_<prompt underscored><seed_motion>_<seed>.mp4
    assert os.path.basename(out) == "ref_a_cat7_7.mp4"
    assert os.path.getsize(out) > 0
    assert calls == ["extract", "sample"]
    assert os.path.exists(tmp_path / "reps" / "ref.npz")
    logged = capsys.readouterr().out
    assert "motion representation extracted" in logged
    assert "guided sampling (5 steps, 2 guided)" in logged
    assert "decode + write" in logged

    # second run: rep is cached on disk -> no re-extraction, no extract log
    out2 = rt.run_example(
        ex,
        motion_rep_dir=str(tmp_path / "reps"),
        output_dir=str(tmp_path / "out"),
        config_root=str(tmp_path),
        verbose=False,
    )
    assert calls == ["extract", "sample", "sample"]
    assert out2 == out
    assert "extracted" not in capsys.readouterr().out


def test_run_example_uses_reference_pt_rep(tmp_path):
    """A reference-produced torch .pt dropped into the rep dir is used
    directly: no re-extraction (drop-in migration from the CUDA reference)."""
    import pytest

    torch = pytest.importorskip("torch")
    frames = np.random.default_rng(1).integers(
        0, 255, size=(6, 32, 32, 3), dtype=np.uint8
    )
    src = str(tmp_path / "ref.mp4")
    write_video(src, frames, fps=8)

    rep_dir = tmp_path / "reps"
    os.makedirs(rep_dir)
    values = np.full((4, 2, 4, 1), 0.5, np.float32)
    indices = np.zeros((4, 2, 4, 1), np.uint8)
    torch.save(
        {"up_blocks.1.motion_modules.0": [
            torch.from_numpy(values), torch.from_numpy(indices)
        ]},
        str(rep_dir / "ref.pt"),
    )

    calls = []
    rt = _stub_runtime(calls)
    ex = Example(video_path="ref.mp4", new_prompt="a cat", seed=7)
    rt.run_example(
        ex,
        motion_rep_dir=str(rep_dir),
        output_dir=str(tmp_path / "out"),
        config_root=str(tmp_path),
        verbose=False,
    )
    # sample ran off the .pt payload; extraction never happened
    assert calls == ["sample"]
    assert not os.path.exists(rep_dir / "ref.npz")


def test_rep_cache_invalidated_on_setting_change(tmp_path):
    """A cached rep extracted under different settings (here: another
    seed_motion) is not reused — the meta record forces re-extraction."""
    frames = np.random.default_rng(2).integers(
        0, 255, size=(6, 32, 32, 3), dtype=np.uint8
    )
    src = str(tmp_path / "ref.mp4")
    write_video(src, frames, fps=8)

    calls = []
    rt = _stub_runtime(calls)
    kw = dict(
        motion_rep_dir=str(tmp_path / "reps"),
        output_dir=str(tmp_path / "out"),
        config_root=str(tmp_path),
        verbose=False,
    )
    rt.run_example(Example(video_path="ref.mp4", new_prompt="a cat", seed=7), **kw)
    rt.run_example(Example(video_path="ref.mp4", new_prompt="a cat", seed=8), **kw)
    # second run extracted again (seed_motion differs from the cached meta)
    assert calls == ["extract", "sample", "extract", "sample"]
    # and the refreshed cache now hits for seed 8
    rt.run_example(Example(video_path="ref.mp4", new_prompt="a cat", seed=8), **kw)
    assert calls == ["extract", "sample", "extract", "sample", "sample"]


def test_encode_prompt_full_reference_surface():
    """encode_prompt's reference-parity breadth (pipeline_animation.py:
    160-247, VERDICT r2 missing #3): prompt lists, a scalar negative
    broadcast over the batch, per-prompt negative lists with a loud
    length-mismatch error, and num_videos_per_prompt consecutive repeats."""
    import jax.numpy as jnp
    import pytest

    rt = object.__new__(MotionCloneRuntime)

    class Tok:
        model_max_length = 77

        def encode_padded(self, text, max_length=77):
            v = sum(map(ord, text)) % 997  # deterministic per-text ids
            return np.full((1, max_length), v, np.int32)

    rt.tokenizer = Tok()
    rt.clip_params = None
    # fake CLIP: embedding rows are just the (batched) ids broadcast to D=8
    rt._clip_apply = lambda p, ids: (
        jnp.asarray(ids, jnp.float32)[:, :, None] * jnp.ones((1, 1, 8))
    )

    def row(text):
        return np.asarray(
            rt._clip_apply(None, Tok().encode_padded(text))
        )[0]

    # single str (the original surface)
    uncond, cond = rt.encode_prompt("a cat", "bad")
    assert uncond.shape == cond.shape == (1, 77, 8)
    np.testing.assert_array_equal(np.asarray(cond[0]), row("a cat"))

    # prompt list + scalar negative broadcast
    uncond, cond = rt.encode_prompt(["a cat", "a dog"], "bad")
    assert cond.shape == uncond.shape == (2, 77, 8)
    np.testing.assert_array_equal(np.asarray(cond[1]), row("a dog"))
    np.testing.assert_array_equal(np.asarray(uncond[0]), np.asarray(uncond[1]))

    # per-prompt negative list
    uncond, _ = rt.encode_prompt(["a cat", "a dog"], ["ugly", "blurry"])
    np.testing.assert_array_equal(np.asarray(uncond[0]), row("ugly"))
    np.testing.assert_array_equal(np.asarray(uncond[1]), row("blurry"))

    # mismatched list lengths raise (reference :207-213)
    with pytest.raises(ValueError, match="batch size"):
        rt.encode_prompt(["a cat", "a dog"], ["only-one"])

    # num_videos_per_prompt: each prompt repeated consecutively
    uncond, cond = rt.encode_prompt(
        ["a cat", "a dog"], "bad", num_videos_per_prompt=3
    )
    assert cond.shape == (6, 77, 8)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(cond[i]), row("a cat"))
        np.testing.assert_array_equal(np.asarray(cond[3 + i]), row("a dog"))


def test_decode_latents_overlap_chunks_match_single_call():
    """The frame-sliced decode (host-fetch overlap) must concatenate to
    exactly the single-call result, and fall back to one call when the
    frame count does not split or frames are mesh-sharded."""
    import jax.numpy as jnp

    rt = object.__new__(MotionCloneRuntime)
    rt.dtype = jnp.float32
    rt.vae_params = None
    rt.frame_sharding = None
    rt.frame_shard_map = None
    from motionclone_tpu.models.vae import VAEConfig

    rt.vae_cfg = VAEConfig()
    calls = []

    def fake_decode(p, z):
        calls.append(z.shape)
        # per-frame deterministic "decode": broadcast to a pixel grid
        return jnp.tile(z[..., :3], (1, 1, 2, 2, 1)) * 2.0

    rt._vae_decode = fake_decode

    z = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 4, 8, 8, 4)), jnp.float32
    )
    single = rt.decode_latents(z, overlap_chunks=1)
    calls.clear()
    split = rt.decode_latents(z, overlap_chunks=2)
    np.testing.assert_allclose(split, single, rtol=1e-6)
    assert calls == [(1, 2, 8, 8, 4), (1, 2, 8, 8, 4)]

    # odd frame count: falls back to one call
    z3 = z[:, :3]
    calls.clear()
    out = rt.decode_latents(z3, overlap_chunks=2)
    assert calls == [(1, 3, 8, 8, 4)] and out.shape[0] == 3

    # frame sharding active: falls back to one call
    rt.frame_sharding = object()
    calls.clear()
    rt.decode_latents(z, overlap_chunks=2)
    assert calls == [(1, 4, 8, 8, 4)]
