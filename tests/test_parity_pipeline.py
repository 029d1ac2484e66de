"""Plumbing test for the real-weights parity runner (VERDICT.md item 3).

Real checkpoints don't exist in this environment, so the compute is
stubbed: a fake runtime writes deterministic mp4s with the reference's
output naming, a fake ``generated_videos/`` dir holds noised copies, and
the test asserts :func:`run_parity` reconstructs the committed-oracle
workloads exactly (configs, examples, seed 76739), matches outputs by
name, and reports sane PSNR/SSIM.
"""

import json
import os

import numpy as np

from motionclone_tpu.config import InferenceConfig
from motionclone_tpu.io.video import read_video_frames, write_video
from motionclone_tpu.pipeline.parity import REFERENCE_SEED, run_parity

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RNG = np.random.default_rng(0)


def _frames(seed):
    return np.random.default_rng(seed).integers(
        0, 255, size=(4, 32, 32, 3), dtype=np.uint8
    )


class StubRuntime:
    calls = []

    def __init__(self, pretrained_model_path, cfg, **kwargs):
        assert isinstance(cfg, InferenceConfig)
        self.cfg = cfg
        StubRuntime.calls.append((pretrained_model_path, cfg, kwargs))

    def run_example(self, example, *, motion_rep_dir, output_dir,
                    default_seed, config_root, verbose=True):
        assert default_seed == REFERENCE_SEED == 76739
        seed = example.seed if example.seed is not None else default_seed
        stem = os.path.splitext(os.path.basename(example.video_path))[0]
        name = (
            f"{stem}_{example.new_prompt.replace(' ', '_')}{seed}_{seed}.mp4"
        )
        out = os.path.join(output_dir, name)
        os.makedirs(output_dir, exist_ok=True)
        write_video(out, _frames(hash(name) % 2**31), fps=8)
        return out


def test_run_parity_plumbing(tmp_path):
    StubRuntime.calls = []
    out_dir = str(tmp_path / "out")
    ref_dir = str(tmp_path / "generated_videos")
    os.makedirs(ref_dir)

    # first pass just to learn the produced names, then build the fake
    # reference dir from noised decodes and score for real
    summary = run_parity(
        ref_dir,
        out_dir,
        config_root=REPO,
        runtime_factory=StubRuntime,
        verbose=False,
    )
    assert summary["generated"] == 2 and summary["matched"] == 0

    # the exact workloads of the committed oracle, seed 76739
    names = sorted(p["name"] for p in summary["pairs"])
    assert names == [
        "camera_zoom_out_Dog,_lying_on_the_grass76739_76739.mp4",
        "sample_white_tiger_Lion,_walks_in_the_forest76739_76739.mp4",
    ]
    # rgb workload ran with the rgb config, sketch with the sketch config
    steps = sorted(c[1].inference_steps for c in StubRuntime.calls)
    assert steps == [100, 200]

    for p in summary["pairs"]:
        frames, _ = read_video_frames(os.path.join(out_dir, p["name"]))
        noised = np.clip(
            frames.astype(np.int16) + RNG.integers(-2, 3, frames.shape),
            0, 255,
        ).astype(np.uint8)
        write_video(os.path.join(ref_dir, p["name"]), noised, fps=8)

    summary = run_parity(
        ref_dir,
        out_dir,
        config_root=REPO,
        runtime_factory=StubRuntime,
        verbose=False,
    )
    assert summary["matched"] == 2
    assert summary["psnr_mean"] > 30.0  # near-identical videos
    assert 0.9 < summary["ssim_mean"] <= 1.0
    json.dumps(summary)  # JSON-serializable end to end


def test_script_entrypoint(tmp_path, monkeypatch, capsys):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "parity_pipeline", os.path.join(REPO, "scripts", "parity_pipeline.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import motionclone_tpu.pipeline.parity as parity_mod

    monkeypatch.setattr(
        parity_mod, "_default_runtime_factory", StubRuntime
    )
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    rc = mod.main(
        [
            "--reference-outputs", str(ref_dir),
            "--output-dir", str(tmp_path / "out"),
            "--config-root", REPO,
            "--workloads", "rgb",
        ]
    )
    line = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["generated"] == 1
    assert rc == 1  # nothing matched against an empty reference dir
