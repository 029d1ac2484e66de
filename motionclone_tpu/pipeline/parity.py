"""Real-weights output-parity runner against the reference's committed oracle.

The reference repo's only end-to-end validation artifact is two committed
sample mp4s plus the exact config snapshot that produced them
(reference ``generated_videos/``: the i2v RGB "Dog, lying on the grass" and
the i2v sketch "Lion, walks in the forest", both seed 76739 — the reference
i2v driver's default seed, ``i2v_video_sample.py:148``). BASELINE.md makes
PSNR/SSIM against those mp4s the acceptance bar.

:func:`run_parity` reproduces both workloads with the shipped configs and
seed 76739, scores each produced mp4 against the same-named reference
output, and returns one summary record. It executes end-to-end the moment
real checkpoints are present under ``models/``; its plumbing (workload
reconstruction, naming, scoring, JSON shape) is tested with a stub runtime
in tests/test_parity_pipeline.py.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional, Sequence

from motionclone_tpu.config import load_examples, load_inference_config
from motionclone_tpu.utils.metrics import compare_videos

# The two workloads whose outputs the reference committed
# (generated_videos/*.mp4; the snapshot inference_config.json records the
# sketch run, the Dog output matches the rgb workload's example + config).
WORKLOADS = {
    "rgb": ("configs/i2v_rgb.yaml", "configs/i2v_rgb.jsonl"),
    "sketch": ("configs/i2v_sketch.yaml", "configs/i2v_sketch.jsonl"),
}

# reference i2v_video_sample.py:148 — the seed of the committed outputs
REFERENCE_SEED = 76739


def _default_runtime_factory(pretrained_model_path, cfg, **kwargs):
    from motionclone_tpu.pipeline.runner import MotionCloneRuntime

    return MotionCloneRuntime(pretrained_model_path, cfg, **kwargs)


def run_parity(
    reference_outputs: str,
    output_dir: str,
    *,
    config_root: str = ".",
    pretrained_model_path: str = "models/StableDiffusion",
    workloads: Sequence[str] = ("rgb", "sketch"),
    width: int = 512,
    height: int = 512,
    video_length: int = 16,
    attention_impl: str = "auto",
    runtime_factory: Optional[Callable] = None,
    motion_rep_dir: Optional[str] = None,
    verbose: bool = True,
) -> Dict:
    """Generate the committed-oracle workloads and score them.

    Returns ``{"pairs": [{name, psnr_mean, ssim_mean, ...}], "psnr_mean",
    "ssim_mean", "generated", "matched"}``. Workload configs/examples are the
    shipped files; every example runs with default seed 76739.
    """
    factory = runtime_factory or _default_runtime_factory
    motion_rep_dir = motion_rep_dir or os.path.join(output_dir, "motion_rep")
    os.makedirs(output_dir, exist_ok=True)

    produced = []
    for name in workloads:
        cfg_path, examples_path = WORKLOADS[name]
        cfg = load_inference_config(
            os.path.join(config_root, cfg_path),
            width=width,
            height=height,
            video_length=video_length,
        )
        examples = load_examples(os.path.join(config_root, examples_path))
        runtime = factory(
            pretrained_model_path,
            cfg,
            config_root=config_root,
            attention_impl=attention_impl,
        )
        for example in examples:
            out = runtime.run_example(
                example,
                motion_rep_dir=motion_rep_dir,
                output_dir=output_dir,
                default_seed=REFERENCE_SEED,
                config_root=config_root,
                verbose=verbose,
            )
            produced.append(out)

    ref_names = {
        n
        for n in os.listdir(reference_outputs)
        if n.endswith(".mp4")
    }
    pairs = []
    for out in produced:
        base = os.path.basename(out)
        if base not in ref_names:
            pairs.append({"name": base, "matched": False})
            continue
        rec = compare_videos(out, os.path.join(reference_outputs, base))
        rec["name"] = base
        rec["matched"] = True
        pairs.append(rec)

    scored = [p for p in pairs if p.get("matched")]
    summary = {
        "pairs": pairs,
        "generated": len(produced),
        "matched": len(scored),
        "psnr_mean": (
            sum(p["psnr_mean"] for p in scored) / len(scored) if scored else None
        ),
        "ssim_mean": (
            sum(p["ssim_mean"] for p in scored) / len(scored) if scored else None
        ),
    }
    return summary
