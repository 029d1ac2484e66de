"""Command-line entry points (installed as motionclone-t2v / -i2v / -sweep).

The repo-root scripts ``t2v_video_sample.py`` / ``i2v_video_sample.py`` /
``sweep_video_sample.py`` mirror the reference's flag surface
(reference t2v_video_sample.py:107-124, i2v_video_sample.py:140-157) and
delegate here, so installed and in-repo invocations share one code path.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional, Sequence

import jax.numpy as jnp

from motionclone_tpu.config import load_examples, load_inference_config
from motionclone_tpu.pipeline.runner import MotionCloneRuntime


def build_parser(
    default_config: str, default_examples: str, default_seed: int = 2025
) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--pretrained-model-path", type=str, default="models/StableDiffusion"
    )
    parser.add_argument("--inference_config", type=str, default=default_config)
    parser.add_argument("--examples", type=str, default=default_examples)
    parser.add_argument(
        "--motion-representation-save-dir", type=str, default="motion_representation/"
    )
    parser.add_argument(
        "--generated-videos-save-dir", type=str, default="generated_videos"
    )
    parser.add_argument("--default-seed", type=int, default=default_seed)
    parser.add_argument("--L", type=int, default=16)
    parser.add_argument("--W", type=int, default=512)
    parser.add_argument("--H", type=int, default=512)
    parser.add_argument("--config-root", type=str, default=".")
    parser.add_argument("--float32", action="store_true")
    parser.add_argument(
        "--visible_gpu",
        type=str,
        default=None,
        help="accepted for reference CLI compatibility "
        "(reference t2v_video_sample.py:116 pins CUDA_VISIBLE_DEVICES); "
        "ignored on TPU — device selection is JAX_PLATFORMS / mesh flags",
    )
    parser.add_argument(
        "--without-xformers",
        action="store_true",
        help="reference-compatible alias for --attention-impl xla "
        "(reference t2v_video_sample.py:122 disables the memory-efficient "
        "CUDA kernels; here it disables the Pallas kernels)",
    )
    parser.add_argument(
        "--attention-impl",
        type=str,
        default="auto",
        choices=["auto", "xla", "chunked", "flash", "fused"],
        help="attention backend (the reference's --without-xformers analog: "
        "'xla' is the plain einsum path, 'auto' picks the Pallas kernels "
        "on TPU)",
    )
    parser.add_argument(
        "--resume",
        action="store_true",
        help="checkpoint sampling progress per chunk and continue an "
        "interrupted run from the last finished chunk",
    )
    parser.add_argument(
        "--frame-shard",
        type=int,
        default=0,
        metavar="N",
        help="split the frame axis over N local devices (N must divide "
        "--L). t2v/i2v: single-video latency scaling; sweeps: composes "
        "with example data-parallelism over a (data, [cfg,] frames) mesh "
        "(examples per batch = devices / N / cfg)",
    )
    parser.add_argument(
        "--frame-shard-mode",
        type=str,
        default="shardmap",
        choices=["shardmap", "gspmd"],
        help="frame-sharding execution: 'shardmap' keeps the fused Pallas "
        "kernels per chip with explicit temporal-attention all_gathers "
        "(fastest; t2v and i2v/controlnet), 'gspmd' lets XLA partition a "
        "pure-XLA graph (general fallback)",
    )
    parser.add_argument(
        "--cfg-pair",
        action="store_true",
        help="split each classifier-free-guidance pair over a 'cfg' mesh "
        "axis of size 2. With --frame-shard N: a composed (cfg, frames) "
        "mesh over 2N devices (single-video latency); in sweeps: a "
        "(data, cfg) mesh (best when chips outnumber examples)",
    )
    parser.add_argument(
        "--approx",
        type=str,
        default="",
        metavar="MODE[:K]",
        help="OUTPUT-CHANGING speed mode; default is the exact pipeline. "
        "'uncond-cache[:K]': cross-step cache — refresh the unconditional "
        "UNet forward every K steps (default 3) and reuse the cached "
        "prediction in between (the conditional pass and motion guidance "
        "stay exact). 'guidance-cache[:K]': refresh the motion-guidance "
        "gradient (the cond fwd+bwd) every K guided steps (default 2); in "
        "between a plain conditional forward supplies the CFG term and the "
        "cached gradient is re-applied with the current ramp. "
        "'uncond-extrap[:K]': like uncond-cache but the cached prediction "
        "is linearly extrapolated in timestep space between refreshes "
        "(lower deviation, same speed). 'step-cache[:K]': run the FULL "
        "step (controlnet + uncond + cond/grad) every K steps (default 2) "
        "and in between hold the cached combined noise prediction — only "
        "the DDIM update runs on skip steps. 'step-extrap[:K]': like "
        "step-cache but the held prediction is linearly extrapolated from "
        "the last two full steps (a linear-multistep solver on skip "
        "steps; lower deviation, same speed). Combine with a comma: "
        "'uncond-extrap:3,guidance-cache:2' or 'step-extrap:2'. "
        "Recommended operating point for every reference workload: "
        "'step-extrap:3' (~2.7-2.9x speedup, SSIM >= 0.99 vs exact on all "
        "three schedules); 'step-extrap:2' when closest-to-exact output "
        "matters, 'step-extrap:5' for t2v_object throughput — measured "
        "per-workload tables in PERF.md 'per-workload approx quality'",
    )
    parser.add_argument(
        "--compile-cache",
        type=str,
        default="",
        metavar="DIR",
        help="persistent XLA compile-cache directory: the first run pays "
        "the jit compiles (~minutes at 512x512), later startups reload the "
        "executables in seconds — including after edits to calling "
        "scripts (cache keys are made source-location-independent; "
        "utils/compile_cache.py)",
    )
    parser.add_argument(
        "--weights-cache",
        type=str,
        default="",
        metavar="DIR",
        help="cache the converted flax parameters in DIR: the torch->flax "
        "conversion + merge pipeline runs once per unique checkpoint/LoRA/"
        "config set, later startups mmap the cached safetensors",
    )
    return parser


_APPROX_DEFAULTS = {
    "uncond-cache": 3,
    "uncond-extrap": 3,
    "guidance-cache": 2,
    "step-cache": 2,
    "step-extrap": 2,
}


def parse_approx(spec: str) -> tuple:
    """'--approx MODE[:K][,MODE[:K]]' ->
    (uncond_interval, guidance_interval, uncond_extrap, step_interval,
    step_extrap).

    Modes: ``uncond-cache`` (cross-step uncond-prediction cache),
    ``uncond-extrap`` (the same cache, linearly extrapolated in timestep
    space between refreshes — lower deviation at the same speed),
    ``guidance-cache`` (cross-step motion-guidance-gradient cache), and
    ``step-cache`` / ``step-extrap`` (whole-step cache: the full step runs
    every K steps, in between the held/extrapolated combined noise
    prediction drives the DDIM update alone); an interval of 1 means that
    cache is off.
    """
    intervals = dict.fromkeys(_APPROX_DEFAULTS, 1)
    if not spec:
        return 1, 1, 0.0, 1, 0.0
    for part in spec.split(","):
        name, _, k = part.strip().partition(":")
        if name not in _APPROX_DEFAULTS:
            raise SystemExit(
                f"unknown --approx mode {name!r} (supported: "
                f"uncond-cache[:K], uncond-extrap[:K], guidance-cache[:K], "
                f"step-cache[:K], step-extrap[:K])"
            )
        interval = int(k) if k else _APPROX_DEFAULTS[name]
        if interval < 2:
            raise SystemExit(f"--approx {name}:K needs K >= 2")
        intervals[name] = interval
    if intervals["uncond-cache"] > 1 and intervals["uncond-extrap"] > 1:
        raise SystemExit(
            "--approx uncond-cache and uncond-extrap are the same cache "
            "(held vs extrapolated) — pick one"
        )
    if intervals["step-cache"] > 1 and intervals["step-extrap"] > 1:
        raise SystemExit(
            "--approx step-cache and step-extrap are the same cache "
            "(held vs extrapolated) — pick one"
        )
    extrap = 1.0 if intervals["uncond-extrap"] > 1 else 0.0
    uncond_k = max(intervals["uncond-cache"], intervals["uncond-extrap"])
    step_w = 1.0 if intervals["step-extrap"] > 1 else 0.0
    step_k = max(intervals["step-cache"], intervals["step-extrap"])
    return uncond_k, intervals["guidance-cache"], extrap, step_k, step_w


def _setup(args, cfg=None):
    if getattr(args, "compile_cache", ""):
        from motionclone_tpu.utils.compile_cache import setup_compile_cache

        setup_compile_cache(args.compile_cache)
    if getattr(args, "visible_gpu", None):
        print(
            "--visible_gpu is a no-op on TPU (reference CUDA pinning); "
            "use JAX device flags instead"
        )
    if getattr(args, "without_xformers", False):
        args.attention_impl = "xla"
    if cfg is None:
        cfg = load_inference_config(
            args.inference_config, width=args.W, height=args.H,
            video_length=args.L,
        )
    uncond_k, guidance_k, uncond_extrap, step_k, step_extrap = parse_approx(
        getattr(args, "approx", "")
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
        attention_impl=args.attention_impl,
        config_root=args.config_root,
        frame_shard=args.frame_shard,
        frame_shard_mode=args.frame_shard_mode,
        cfg_pair=getattr(args, "cfg_pair", False),
        uncond_interval=uncond_k,
        guidance_interval=guidance_k,
        uncond_extrap=uncond_extrap,
        step_interval=step_k,
        step_extrap=step_extrap,
        weights_cache=args.weights_cache,
    )
    return cfg, runtime


def run_serial(args, cfg=None, examples=None) -> None:
    _, runtime = _setup(args, cfg=cfg)
    if examples is None:
        examples = load_examples(args.examples)
    for example in examples:
        out_path = runtime.run_example(
            example,
            motion_rep_dir=args.motion_representation_save_dir,
            output_dir=args.generated_videos_save_dir,
            default_seed=args.default_seed,
            config_root=args.config_root,
            resume=args.resume,
        )
        print(out_path, "is done")


def t2v_main(argv: Optional[Sequence[str]] = None) -> None:
    args = build_parser(
        "configs/t2v_camera.yaml", "configs/t2v_camera.jsonl"
    ).parse_args(argv)
    run_serial(args)


def i2v_main(argv: Optional[Sequence[str]] = None) -> None:
    # defaults match reference i2v_video_sample.py:143-148: the sketch
    # workload with seed 76739 (the seed of the committed sample outputs)
    args = build_parser(
        "configs/i2v_sketch.yaml", "configs/i2v_sketch.jsonl", default_seed=76739
    ).parse_args(argv)
    cfg = load_inference_config(
        args.inference_config, width=args.W, height=args.H, video_length=args.L
    )
    if not cfg.controlnet_path or not cfg.controlnet_config:
        raise ValueError(
            "i2v requires controlnet_path and controlnet_config in the YAML"
        )
    examples = list(load_examples(args.examples))
    for example in examples:
        if not example.condition_image_paths:
            raise ValueError(
                f"i2v example missing condition_image_paths: {example}"
            )
        if len(example.image_index) != len(example.condition_image_paths):
            # reference i2v_video_sample.py:111 asserts this pairing
            raise ValueError(
                f"i2v example has {len(example.condition_image_paths)} "
                f"condition images but {len(example.image_index)} "
                f"image_index entries: {example}"
            )
    # pass the validated objects through — the pre-checks and the run see
    # the same config/examples, parsed once
    run_serial(args, cfg=cfg, examples=examples)


def serve_main(argv: Optional[Sequence[str]] = None) -> None:
    """Warm-runtime HTTP job server (new TPU-native surface; the reference
    pays model load + startup per process — see serve.py docstring)."""
    from motionclone_tpu.serve import MotionCloneServer

    parser = build_parser("configs/t2v_camera.yaml", "configs/t2v_camera.jsonl")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument(
        "--max-queue", type=int, default=64,
        help="maximum queued jobs before POST /generate returns 503",
    )
    parser.add_argument(
        "--batch-max", type=int, default=0,
        help="throughput batching: drain up to this many queued jobs per "
        "pass and run them data-parallel over the local chips "
        "(pipeline.sweep). 0 = local device count; 1 = strictly serial",
    )
    parser.add_argument(
        "--job-timeout", type=float, default=1800.0,
        help="per-job wall-clock bound in seconds: a job (or batch) "
        "exceeding it is failed and the queue keeps draining — a wedged "
        "TPU dispatch must not freeze the server forever. 0 disables",
    )
    args = parser.parse_args(argv)
    import jax

    from motionclone_tpu.config import Example

    _, runtime = _setup(args)
    batch_max = args.batch_max or len(jax.local_devices())
    if args.frame_shard:
        # frame sharding is the single-video latency mode: the runtime's
        # sampling fns are built over a (cfg, frames) mesh, which conflicts
        # with run_sweep's own data mesh — keep serving strictly serial so
        # batched jobs never mix the two shardings (sweep_main instead
        # zeroes frame_shard before _setup, cli.py:~315)
        if batch_max > 1:
            print(
                "--frame-shard set: forcing --batch-max 1 (frame-sharded "
                "runtimes serve jobs serially; use an unsharded runtime "
                "for throughput batching)"
            )
        batch_max = 1

    def run_job(example_dict):
        return runtime.run_example(
            Example.from_json(example_dict),
            motion_rep_dir=args.motion_representation_save_dir,
            output_dir=args.generated_videos_save_dir,
            default_seed=args.default_seed,
            config_root=args.config_root,
            resume=args.resume,
        )

    run_jobs_batch = None
    if batch_max > 1:
        from motionclone_tpu.pipeline.sweep import run_sweep

        def run_jobs_batch(example_dicts):
            examples = [Example.from_json(d) for d in example_dicts]
            # sweeps need uniform condition-image counts per batch
            # (run_sweep docstring); group, sweep each group, restore order
            groups = {}
            for i, ex in enumerate(examples):
                groups.setdefault(len(ex.condition_image_paths), []).append(i)
            paths = [None] * len(examples)
            for indices in groups.values():
                group_paths = run_sweep(
                    runtime,
                    [examples[i] for i in indices],
                    motion_rep_dir=args.motion_representation_save_dir,
                    output_dir=args.generated_videos_save_dir,
                    default_seed=args.default_seed,
                    config_root=args.config_root,
                    resume=args.resume,
                )
                for i, p in zip(indices, group_paths):
                    paths[i] = p
            return paths

    server = MotionCloneServer(
        run_job,
        run_jobs_batch=run_jobs_batch,
        batch_max=batch_max,
        host=args.host,
        port=args.port,
        max_queue=args.max_queue,
        job_timeout=args.job_timeout or None,
    )
    print(
        f"motionclone-serve listening on http://{args.host}:{server.port} "
        "(POST /generate, GET /jobs /health /metrics)",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


def sweep_main(argv: Optional[Sequence[str]] = None) -> None:
    import jax

    from motionclone_tpu.pipeline.sweep import run_sweep

    parser = build_parser("configs/t2v_camera.yaml", "configs/t2v_camera.jsonl")
    parser.add_argument("--num-devices", type=int, default=0)
    parser.add_argument(
        "--distributed",
        action="store_true",
        help="multi-host sweep: join the JAX distributed runtime (cluster "
        "auto-detection on TPU pods), stride-partition the examples across "
        "processes, and sweep this host's local chips — share-nothing, no "
        "cross-host collectives",
    )
    parser.add_argument(
        "--coordinator",
        type=str,
        default="",
        metavar="HOST:PORT",
        help="distributed coordinator address (implies --distributed; "
        "omit on TPU pods where auto-detection fills it in)",
    )
    parser.add_argument(
        "--num-processes", type=int, default=0,
        help="distributed process count (with --coordinator)",
    )
    parser.add_argument(
        "--process-id", type=int, default=-1,
        help="this process's distributed rank (with --coordinator)",
    )
    args = parser.parse_args(argv)
    from motionclone_tpu.parallel.distributed import (
        maybe_initialize_from_args,
        partition_examples,
    )

    multi_process = maybe_initialize_from_args(args)
    # sweeps own their mesh: the runtime is built unsharded and run_sweep
    # composes a (data, frames) mesh itself (GSPMD mode; shardmap does not
    # batch examples)
    frame_shard = args.frame_shard
    args.frame_shard = 0
    cfg_pair = args.cfg_pair
    args.cfg_pair = False  # run_sweep composes its own mesh
    if frame_shard:
        print(f"sweep frame sharding runs in {args.frame_shard_mode} mode")
    _, runtime = _setup(args)
    examples = load_examples(args.examples)
    if multi_process:
        examples = partition_examples(examples)
        print(
            f"process {jax.process_index()}/{jax.process_count()}: "
            f"{len(examples)} examples over {len(jax.local_devices())} "
            f"local devices ({len(jax.devices())} global)"
        )
        if not examples:
            return
    else:
        print(f"{len(examples)} examples over {len(jax.devices())} devices")
    paths = run_sweep(
        runtime,
        examples,
        motion_rep_dir=args.motion_representation_save_dir,
        output_dir=args.generated_videos_save_dir,
        default_seed=args.default_seed,
        config_root=args.config_root,
        num_devices=args.num_devices,
        cfg_pair=cfg_pair,
        frame_shard=frame_shard,
        frame_shard_mode=args.frame_shard_mode,
        resume=args.resume,
    )
    for p in paths:
        print(p, "is done")
