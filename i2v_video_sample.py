"""I2V / sketch-to-video motion-cloning CLI — mirrors the reference's
i2v_video_sample.py: SparseControlNet conditioning (RGB or scribble) on top
of the guided sampling pipeline.  (reference: /root/reference/
i2v_video_sample.py:140-157 for the flag surface)
"""

import argparse
import json
import os

import jax.numpy as jnp

from motionclone_tpu.config import load_examples, load_inference_config
from motionclone_tpu.pipeline.runner import MotionCloneRuntime


def main(args):
    config_root = args.config_root
    cfg = load_inference_config(
        args.inference_config,
        width=args.W,
        height=args.H,
        video_length=args.L,
    )
    if not cfg.controlnet_path or not cfg.controlnet_config:
        raise ValueError(
            "i2v requires controlnet_path and controlnet_config in the YAML"
        )

    os.makedirs(args.generated_videos_save_dir, exist_ok=True)
    with open(
        os.path.join(args.generated_videos_save_dir, "inference_config.json"), "w"
    ) as f:
        json.dump({k: str(v) for k, v in vars(cfg).items()}, f, indent=2)

    runtime = MotionCloneRuntime(
        args.pretrained_model_path,
        cfg,
        dtype=jnp.bfloat16 if not args.float32 else jnp.float32,
        config_root=config_root,
    )

    for example in load_examples(args.examples):
        if not example.condition_image_paths:
            raise ValueError(f"i2v example missing condition_image_paths: {example}")
        out_path = runtime.run_example(
            example,
            motion_rep_dir=args.motion_representation_save_dir,
            output_dir=args.generated_videos_save_dir,
            default_seed=args.default_seed,
            config_root=config_root,
        )
        print(out_path, "is done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pretrained-model-path", type=str, default="models/StableDiffusion"
    )
    parser.add_argument("--inference_config", type=str, default="configs/i2v_rgb.yaml")
    parser.add_argument("--examples", type=str, default="configs/i2v_rgb.jsonl")
    parser.add_argument(
        "--motion-representation-save-dir", type=str, default="motion_representation/"
    )
    parser.add_argument(
        "--generated-videos-save-dir", type=str, default="generated_videos"
    )
    parser.add_argument("--default-seed", type=int, default=2025)
    parser.add_argument("--L", type=int, default=16)
    parser.add_argument("--W", type=int, default=512)
    parser.add_argument("--H", type=int, default=512)
    parser.add_argument("--config-root", type=str, default=".")
    parser.add_argument("--float32", action="store_true")
    main(parser.parse_args())
