"""Data-parallel T2V sweep: all JSONL examples sharded across TPU chips.

New TPU-native surface (the reference is strictly serial/single-GPU,
SURVEY §2.5): examples batch along the leading axis and shard over the
mesh's ``data`` axis; a v5e-8 slice runs 8 examples per sampling pass.
"""

import argparse
import os

import jax
import jax.numpy as jnp

from motionclone_tpu.config import load_examples, load_inference_config
from motionclone_tpu.pipeline.runner import MotionCloneRuntime
from motionclone_tpu.pipeline.sweep import run_sweep


def main(args):
    cfg = load_inference_config(
        args.inference_config, width=args.W, height=args.H, video_length=args.L
    )
    runtime = MotionCloneRuntime(
        args.pretrained_model_path,
        cfg,
        dtype=jnp.bfloat16 if not args.float32 else jnp.float32,
        config_root=args.config_root,
    )
    examples = load_examples(args.examples)
    print(f"{len(examples)} examples over {len(jax.devices())} devices")
    paths = run_sweep(
        runtime,
        examples,
        motion_rep_dir=args.motion_representation_save_dir,
        output_dir=args.generated_videos_save_dir,
        default_seed=args.default_seed,
        config_root=args.config_root,
        num_devices=args.num_devices,
    )
    for p in paths:
        print(p, "is done")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pretrained-model-path", type=str, default="models/StableDiffusion"
    )
    parser.add_argument(
        "--inference_config", type=str, default="configs/t2v_camera.yaml"
    )
    parser.add_argument("--examples", type=str, default="configs/t2v_camera.jsonl")
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
    parser.add_argument("--num-devices", type=int, default=0)
    parser.add_argument("--float32", action="store_true")
    main(parser.parse_args())
