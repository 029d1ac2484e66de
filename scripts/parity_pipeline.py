"""One-command real-weights parity run against the reference's committed mp4s.

Reproduces the two workloads whose outputs the reference repo committed
(generated_videos/: i2v rgb "Dog..." + i2v sketch "Lion...", seed 76739),
scores PSNR/SSIM against them, and prints ONE JSON line — BASELINE.md's
acceptance criterion, executable the day real checkpoints land under
models/.

Usage (from the repo root, checkpoints laid out as the reference expects):
    python scripts/parity_pipeline.py --reference-outputs /path/to/generated_videos
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--reference-outputs",
        required=True,
        help="dir holding the reference's committed sample mp4s",
    )
    p.add_argument("--output-dir", default="parity_outputs")
    p.add_argument("--config-root", default=".")
    p.add_argument("--pretrained-model-path", default="models/StableDiffusion")
    p.add_argument(
        "--workloads", default="rgb,sketch", help="comma-separated subset"
    )
    p.add_argument("--attention-impl", default="auto")
    args = p.parse_args(argv)

    from motionclone_tpu.pipeline.parity import run_parity

    summary = run_parity(
        args.reference_outputs,
        args.output_dir,
        config_root=args.config_root,
        pretrained_model_path=args.pretrained_model_path,
        workloads=tuple(args.workloads.split(",")),
        attention_impl=args.attention_impl,
    )
    print(json.dumps(summary))
    return 0 if summary["matched"] == summary["generated"] else 1


if __name__ == "__main__":
    sys.exit(main())
