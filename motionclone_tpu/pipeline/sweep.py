"""Data-parallel example sweeps over a device mesh.

The reference processes JSONL examples serially on one GPU
(t2v_video_sample.py:75-105); examples are embarrassingly parallel
(independent seeds/prompts/videos — SURVEY §2.5), so here they batch along
the leading axis and shard over the mesh's ``data`` axis.  Host-side work
(video decode, preprocessing) overlaps trivially; the jitted extraction and
sampling functions are batch-size polymorphic, so a sweep is the same code
path as a single example with batch == #devices.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import Example
from motionclone_tpu.io.video import preprocess_video, write_video
from motionclone_tpu.parallel.mesh import (
    cfg_pair_sharding,
    make_mesh,
    make_mesh_2d,
    shard_batch,
    shard_params,
)


def pad_to_multiple(n: int, m: int) -> int:
    return (-n) % m


def batch_examples(
    examples: Sequence[Example], batch_size: int
) -> List[Tuple[List[Example], int]]:
    """Split into batches of ``batch_size``; the last batch is padded by
    repeating its final example (padding outputs are discarded).
    Returns [(examples_incl_padding, n_real)]."""
    batches = []
    for i in range(0, len(examples), batch_size):
        chunk = list(examples[i : i + batch_size])
        n_real = len(chunk)
        chunk += [chunk[-1]] * pad_to_multiple(n_real, batch_size)
        batches.append((chunk, n_real))
    return batches


def run_sweep(
    runtime,
    examples: Sequence[Example],
    *,
    motion_rep_dir: str,
    output_dir: str,
    default_seed: int = 2025,
    config_root: str = ".",
    num_devices: int = 0,
    cfg_pair: bool = False,
) -> List[str]:
    """Run all examples data-parallel; returns written mp4 paths.

    ``runtime`` is a :class:`~motionclone_tpu.pipeline.runner.
    MotionCloneRuntime` (t2v only for now — i2v sweeps would add the
    controlnet condition batch the same way).

    ``cfg_pair``: split each example's classifier-free-guidance pair over a
    second ``cfg`` mesh axis (needs an even device count) — half the
    examples per batch, but both the guided and vanilla steps overlap their
    uncond/cond UNet work across the cfg groups (SURVEY §2.5).  Best when
    there are more chips than pending examples.
    """
    cfg = runtime.infer_cfg
    os.makedirs(motion_rep_dir, exist_ok=True)
    os.makedirs(output_dir, exist_ok=True)

    devices = jax.devices()
    n_dev = num_devices or len(devices)
    if cfg_pair:
        if n_dev < 2 or n_dev % 2:
            raise ValueError(f"cfg_pair needs an even device count, got {n_dev}")
        mesh = make_mesh_2d(data=n_dev // 2, cfg=2, devices=devices)
        from motionclone_tpu.pipeline.motionclone import make_sampling_fns

        fns = make_sampling_fns(
            runtime.unet_cfg,
            runtime.sched_cfg,
            runtime.infer_cfg,
            dtype=runtime.dtype,
            cfg_pair_sharding=cfg_pair_sharding(mesh),
        )
        n_dev = n_dev // 2  # examples per batch = data-axis size
    else:
        mesh = make_mesh(n_dev)
        fns = runtime.pipeline.fns
    params = shard_params(runtime.pipeline.params, mesh)

    out_paths: List[str] = []
    for chunk, n_real in batch_examples(examples, n_dev):
        seeds = [
            e.seed if e.seed is not None else default_seed for e in chunk
        ]

        # --- host: decode + preprocess all reference videos
        videos = np.stack(
            [
                preprocess_video(
                    os.path.join(config_root, e.video_path),
                    cfg.height,
                    cfg.width,
                    cfg.video_length,
                )
                for e in chunk
            ]
        )

        # --- encode prompts (batched through the jitted CLIP)
        unconds, conds = [], []
        empty_emb, _ = runtime.encode_prompt("", "")
        for e in chunk:
            u, c = runtime.encode_prompt(
                e.new_prompt + cfg.positive_prompt, cfg.negative_prompt
            )
            unconds.append(u)
            conds.append(c)
        uncond = shard_batch(jnp.concatenate(unconds, axis=0), mesh)
        cond = shard_batch(jnp.concatenate(conds, axis=0), mesh)
        uncond_empty = shard_batch(
            jnp.concatenate([empty_emb] * len(chunk), axis=0), mesh
        )

        # --- VAE encode + extraction (batched, sharded)
        x = shard_batch(jnp.asarray(videos, dtype=runtime.dtype), mesh)
        mean, logvar = runtime._vae_encode(runtime.vae_params, x)
        from motionclone_tpu.models.vae import sample_latents as vae_sample

        z = jnp.stack(
            [
                vae_sample(mean[i], logvar[i], jax.random.PRNGKey(seeds[i]))
                for i in range(len(chunk))
            ]
        )
        video_latents = shard_batch(z * 0.18215, mesh)

        noise = jnp.stack(
            [
                jax.random.normal(
                    jax.random.PRNGKey(s), video_latents.shape[1:], jnp.float32
                )
                for s in seeds
            ]
        ).astype(video_latents.dtype)
        with mesh:
            rep = fns.extract(
                params, video_latents, shard_batch(noise, mesh),
                uncond_empty, None, None,
            )

        # --- guided sampling (batched, sharded)
        shape = (
            len(chunk),
            cfg.video_length,
            cfg.height // 8,
            cfg.width // 8,
            runtime.unet_cfg.in_channels,
        )
        init_latents = jnp.stack(
            [
                jax.random.normal(jax.random.PRNGKey(s), shape[1:], jnp.float32)
                for s in seeds
            ]
        ).astype(runtime.dtype)
        rep = jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), rep)
        with mesh:
            latents = fns.sample(
                params, shard_batch(init_latents, mesh), uncond, cond, rep,
                None, None,
            )

        # --- decode + write (real examples only)
        for i in range(n_real):
            e = chunk[i]
            frames = runtime.decode_latents(latents[i : i + 1])
            stem = os.path.splitext(os.path.basename(e.video_path))[0]
            prompt = e.new_prompt + cfg.positive_prompt
            name = (
                stem + "_" + prompt.strip().replace(" ", "_")
                + str(seeds[i]) + "_" + str(seeds[i]) + ".mp4"
            )
            path = os.path.join(output_dir, name)
            write_video(path, frames, fps=8)
            out_paths.append(path)
    return out_paths
