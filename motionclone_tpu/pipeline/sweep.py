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
from motionclone_tpu.utils import rng
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
    frame_shard: int = 0,
    frame_shard_mode: str = "gspmd",
    resume: bool = False,
) -> List[str]:
    """Run all examples data-parallel; returns written mp4 paths.

    ``runtime`` is a :class:`~motionclone_tpu.pipeline.runner.
    MotionCloneRuntime`.  i2v (SparseCtrl) sweeps batch the per-example
    controlnet conditions along with the latents; every example in a sweep
    must use the same number of condition images (mixed counts produce
    ragged condition batches — run those serially).

    ``cfg_pair``: split each example's classifier-free-guidance pair over a
    second ``cfg`` mesh axis (needs an even device count) — half the
    examples per batch, but both the guided and vanilla steps overlap their
    uncond/cond UNet work across the cfg groups (SURVEY §2.5).  Best when
    there are more chips than pending examples.

    ``frame_shard``: additionally split every example's frame axis over
    that many devices — examples per batch = devices / frame_shard.
    ``frame_shard_mode`` picks the execution: "gspmd" (default; XLA
    partitions a pure-XLA graph over a (data, frames) mesh) or "shardmap"
    (fused Pallas kernels per chip with explicit temporal all_gathers over
    a (data, [cfg,] frames) mesh — composes with ``cfg_pair``, which gspmd
    mode does not).

    ``resume``: checkpoint each batch's sampling loop per chunk under
    ``output_dir``, keyed by a content hash of the batch's examples+seeds,
    so an interrupted sweep rerun continues exactly where it stopped.
    """
    cfg = runtime.infer_cfg
    os.makedirs(motion_rep_dir, exist_ok=True)
    os.makedirs(output_dir, exist_ok=True)

    # --approx must survive every rebuild of the sampling fns below: a user
    # asking for the cross-step caches gets them in every sweep mode, or a
    # loud error where the composition is unsupported (make_sampling_fns
    # rejects approx x CFG-pair splitting) — never silent exact-math timing
    approx_kwargs = dict(
        uncond_interval=getattr(runtime, "uncond_interval", 1),
        guidance_interval=getattr(runtime, "guidance_interval", 1),
        uncond_extrap=getattr(runtime, "uncond_extrap", 0.0),
        step_interval=getattr(runtime, "step_interval", 1),
        step_extrap=getattr(runtime, "step_extrap", 0.0),
    )

    # local devices: in a multi-host run each process sweeps only its own
    # chips (share-nothing example parallelism — parallel/distributed.py);
    # single-process runs see the identical device list either way
    devices = jax.local_devices()
    n_dev = num_devices or len(devices)
    if frame_shard == 1:
        # a 1-wide frames axis adds no parallelism but would force the
        # Pallas-free impls — run the plain data sweep instead
        print("frame_shard=1 is a no-op; running the plain data sweep")
        frame_shard = 0
    if cfg_pair and frame_shard and frame_shard_mode != "shardmap":
        raise ValueError(
            "cfg_pair composes with frame_shard only in shardmap mode "
            "(a (data, cfg, frames) mesh); gspmd frame sharding does not"
        )
    if cfg_pair and not frame_shard:
        if n_dev < 2 or n_dev % 2:
            raise ValueError(f"cfg_pair needs an even device count, got {n_dev}")
        mesh = make_mesh_2d(data=n_dev // 2, cfg=2, devices=devices)
        from motionclone_tpu.pipeline.motionclone import make_sampling_fns

        fns = make_sampling_fns(
            runtime.unet_cfg,
            runtime.sched_cfg,
            runtime.infer_cfg,
            dtype=runtime.dtype,
            attention_impl=runtime.attention_impl,
            cfg_pair_sharding=cfg_pair_sharding(mesh),
            controlnet_apply=runtime.pipeline.controlnet_apply,
            **approx_kwargs,
        )
        n_dev = n_dev // 2  # examples per batch = data-axis size
    elif frame_shard and frame_shard_mode == "shardmap":
        # explicit-collective sweep: every chip keeps the fused Pallas
        # kernels on its local frames; optional cfg axis splits each
        # example's CFG pair too
        per_ex_devices = frame_shard * (2 if cfg_pair else 1)
        if frame_shard < 1 or cfg.video_length % frame_shard:
            raise ValueError(
                f"frame_shard {frame_shard} must be >= 1 and divide "
                f"video_length={cfg.video_length}"
            )
        if n_dev % per_ex_devices:
            raise ValueError(
                f"frame_shard {frame_shard}"
                + (" x cfg_pair (2)" if cfg_pair else "")
                + f" must divide the device count {n_dev}"
            )
        from motionclone_tpu.parallel.mesh import make_mesh_sweep
        from motionclone_tpu.pipeline.motionclone import make_sampling_fns

        mesh = make_mesh_sweep(
            data=n_dev // per_ex_devices,
            cfg=2 if cfg_pair else 1,
            frames=frame_shard,
            devices=devices,
        )
        cn_apply = runtime.pipeline.controlnet_apply
        if cn_apply is not None and (
            getattr(cn_apply, "frames_axis", None) != "frames"
        ):
            # the controlnet's temporal modules must all_gather K/V across
            # the frame shards: rebuild with frames_axis (same params)
            from motionclone_tpu.models.sparse_controlnet import (
                SparseControlNetModel,
            )
            from motionclone_tpu.pipeline.motionclone import (
                make_controlnet_apply,
            )

            cn_apply = make_controlnet_apply(SparseControlNetModel(
                cfg=runtime.cn_cfg, attention_impl=runtime.attention_impl,
                frames_axis="frames", dtype=runtime.dtype,
            ))
        fns = make_sampling_fns(
            runtime.unet_cfg,
            runtime.sched_cfg,
            runtime.infer_cfg,
            dtype=runtime.dtype,
            attention_impl=runtime.attention_impl,
            frame_shard_map=mesh,
            controlnet_apply=cn_apply,
            **approx_kwargs,
        )
        n_dev = n_dev // per_ex_devices
    elif frame_shard:
        if frame_shard < 1 or cfg.video_length % frame_shard:
            raise ValueError(
                f"frame_shard {frame_shard} must be >= 1 and divide "
                f"video_length={cfg.video_length}"
            )
        if n_dev % frame_shard:
            raise ValueError(
                f"frame_shard {frame_shard} must divide the device count "
                f"{n_dev}"
            )
        from motionclone_tpu.parallel.mesh import (
            frame_sharding,
            make_mesh_data_frames,
        )
        from motionclone_tpu.pipeline.motionclone import make_sampling_fns

        mesh = make_mesh_data_frames(
            data=n_dev // frame_shard, frames=frame_shard, devices=devices
        )
        cn_apply = runtime.pipeline.controlnet_apply
        if cn_apply is not None and runtime.attention_impl not in (
            "xla", "chunked"
        ):
            # the controlnet runs inside the GSPMD-sharded steps: rebuild
            # it on a Pallas-free impl (custom calls can't be partitioned);
            # an explicit Pallas-free --attention-impl is already safe
            from motionclone_tpu.models.sparse_controlnet import (
                SparseControlNetModel,
            )
            from motionclone_tpu.pipeline.motionclone import (
                make_controlnet_apply,
            )

            cn_apply = make_controlnet_apply(SparseControlNetModel(
                cfg=runtime.cn_cfg, attention_impl="chunked",
                dtype=runtime.dtype,
            ))
        fns = make_sampling_fns(
            runtime.unet_cfg,
            runtime.sched_cfg,
            runtime.infer_cfg,
            dtype=runtime.dtype,
            attention_impl=runtime.attention_impl,
            frame_sharding=frame_sharding(mesh),
            controlnet_apply=cn_apply,
            **approx_kwargs,
        )
        n_dev = n_dev // frame_shard  # examples per batch = data-axis size
    else:
        mesh = make_mesh(n_dev, devices=devices)
        fns = runtime.pipeline.fns
    params = shard_params(runtime.pipeline.params, mesh)

    use_cn = getattr(runtime, "cn_cfg", None) is not None
    cn_params = (
        shard_params(runtime.pipeline.cn_params, mesh) if use_cn else None
    )
    if use_cn:
        counts = {len(e.condition_image_paths or ()) for e in examples}
        if len(counts) > 1:
            raise ValueError(
                "i2v sweep needs a uniform condition-image count per "
                f"example, got {sorted(counts)}; run mixed examples serially"
            )

    def _batch_scatter(frames_per_example, chunk):
        """Per-example frame-index scatter -> batched (cond, mask, scale)."""
        from motionclone_tpu.models.sparse_controlnet import scatter_condition

        conds, masks = [], []
        for fc, e in zip(frames_per_example, chunk):
            c, m = scatter_condition(
                fc, tuple(e.image_index), cfg.video_length
            )
            conds.append(c)
            masks.append(m)
        scales = jnp.asarray(
            [
                e.controlnet_scale
                if e.controlnet_scale is not None
                else cfg.controlnet_scale
                for e in chunk
            ],
            runtime.dtype,
        ).reshape(-1, 1, 1, 1, 1)
        return (
            shard_batch(jnp.concatenate(conds, axis=0), mesh),
            shard_batch(jnp.concatenate(masks, axis=0), mesh),
            shard_batch(scales, mesh),
        )

    out_paths: List[str] = []
    for chunk, n_real in batch_examples(examples, n_dev):
        seeds = [
            e.seed if e.seed is not None else default_seed for e in chunk
        ]

        # --- motion-representation disk cache (same record and
        # invalidation rule as runner.run_example step 1); a full-chunk hit
        # skips video preprocessing, VAE encode, and extraction entirely
        from motionclone_tpu.diffusion.guidance import (
            load_motion_representation,
            save_motion_representation,
        )
        from motionclone_tpu.pipeline.runner import (
            _validate_motion_representation,
            locate_cached_rep,
            motion_rep_meta,
        )

        stems = [
            os.path.splitext(os.path.basename(e.video_path))[0]
            for e in chunk
        ]
        metas = [motion_rep_meta(cfg, s) for s in seeds]
        rep_paths = [
            locate_cached_rep(motion_rep_dir, stem, meta)
            for stem, meta in zip(stems, metas)
        ]
        rep = None
        if all(hit is not None for _, hit in rep_paths):
            per_ex = [load_motion_representation(hit) for _, hit in rep_paths]
            keys = set(per_ex[0])
            if all(set(r) == keys for r in per_ex):
                for r, (_, hit) in zip(per_ex, rep_paths):
                    _validate_motion_representation(r, hit, cfg)
                rep = {
                    k: (
                        np.concatenate([r[k][0] for r in per_ex], axis=0),
                        np.concatenate([r[k][1] for r in per_ex], axis=0),
                    )
                    for k in keys
                }

        # --- encode prompts: ONE batched CLIP dispatch per chunk
        # (2B+1 rows; per-prompt dispatches would pay the ~12-15 ms tunnel
        # latency each)
        b = len(chunk)
        ids = jnp.concatenate(
            [
                runtime._tokenize(e.new_prompt + cfg.positive_prompt)
                for e in chunk
            ]
            + [runtime._tokenize(cfg.negative_prompt)] * b
            + [runtime._tokenize("")]
        )
        emb = runtime._clip_apply(runtime.clip_params, ids)
        cond = shard_batch(emb[:b], mesh)
        uncond = shard_batch(emb[b : 2 * b], mesh)
        uncond_empty = shard_batch(
            jnp.concatenate([emb[2 * b :]] * b, axis=0), mesh
        )

        # --- VAE encode + extraction (batched, sharded; skipped on a
        # full-chunk rep-cache hit)
        if rep is None:
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
            x = shard_batch(jnp.asarray(videos, dtype=runtime.dtype), mesh)
            mean, logvar = runtime._vae_encode(runtime.vae_params, x)
            from motionclone_tpu.models.vae import sample_latents as vae_sample

            z = jnp.stack(
                [
                    vae_sample(mean[i], logvar[i],
                               rng.seed_key(seeds[i], rng.VAE_POSTERIOR))
                    for i in range(len(chunk))
                ]
            )
            lat = z * runtime.vae_cfg.scaling_factor
            video_latents = shard_batch(lat, mesh)

            # i2v: extraction conditions come from the reference video
            # itself (runner.run_example step 1; reference
            # motionclone_functions.py:46-63)
            cn_cond_extract = None
            if use_cn:
                frames = []
                for i, e in enumerate(chunk):
                    idx = list(e.image_index)
                    if runtime.cn_cfg.use_simplified_condition_embedding:
                        frames.append(lat[i : i + 1, idx])
                    else:
                        pixels01 = (jnp.asarray(videos[i]) + 1.0) / 2.0
                        frames.append(
                            pixels01[None][:, idx].astype(runtime.dtype)
                        )
                cn_cond_extract = _batch_scatter(frames, chunk)

            noise = jnp.stack(
                [
                    jax.random.normal(
                        rng.seed_key(s, rng.EXTRACT_NOISE), lat.shape[1:],
                        jnp.float32,
                    )
                    for s in seeds
                ]
            ).astype(lat.dtype)
            with mesh:
                rep = fns.extract(
                    params, video_latents, shard_batch(noise, mesh),
                    uncond_empty, cn_params, cn_cond_extract,
                )
            # persist per-example reps for reuse (runner + CUDA-reference
            # interchange; padded tail entries duplicate real ones)
            for i in range(n_real):
                # always persist as native .npz — never clobber a
                # user-dropped reference .pt
                save_motion_representation(
                    os.path.join(motion_rep_dir, stems[i] + ".npz"),
                    {
                        k: (
                            np.asarray(v[i : i + 1]),
                            np.asarray(ix[i : i + 1]),
                        )
                        for k, (v, ix) in rep.items()
                    },
                    meta=metas[i],
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
                jax.random.normal(rng.seed_key(s, rng.INIT_LATENTS), shape[1:],
                                  jnp.float32)
                for s in seeds
            ]
        ).astype(runtime.dtype)
        # i2v: sampling conditions come from each example's condition images
        # (runner.run_example step 2; reference motionclone_functions.py:111-128)
        cn_cond_sample = None
        if use_cn:
            from motionclone_tpu.io.video import load_condition_images
            from motionclone_tpu.models.vae import sample_latents as vae_draw

            frames = []
            for i, e in enumerate(chunk):
                paths = [
                    os.path.join(config_root, p)
                    for p in e.condition_image_paths
                ]
                imgs01 = load_condition_images(paths, cfg.height, cfg.width)
                if runtime.cn_cfg.use_simplified_condition_embedding:
                    x_i = jnp.asarray(imgs01 * 2.0 - 1.0, runtime.dtype)[None]
                    m_i, lv_i = runtime._vae_encode(runtime.vae_params, x_i)
                    z_i = vae_draw(
                        m_i, lv_i,
                        rng.seed_key(seeds[i], rng.CN_IMAGE_POSTERIOR),
                    )
                    frames.append(z_i * runtime.vae_cfg.scaling_factor)
                else:
                    frames.append(jnp.asarray(imgs01, runtime.dtype)[None])
            cn_cond_sample = _batch_scatter(frames, chunk)

        resume_path, resume_tag = None, ""
        if resume:
            import hashlib

            resume_tag = hashlib.sha1(
                "|".join(
                    f"{e.video_path}:{e.new_prompt}:{s}"
                    for e, s in zip(chunk, seeds)
                ).encode()
            ).hexdigest()[:16]
            resume_path = os.path.join(
                output_dir, f".resume_sweep_{resume_tag}.npz"
            )

        rep = jax.tree_util.tree_map(lambda a: shard_batch(a, mesh), rep)
        with mesh:
            latents = fns.sample(
                params, shard_batch(init_latents, mesh), uncond, cond, rep,
                cn_params, cn_cond_sample,
                resume_path=resume_path, resume_tag=resume_tag,
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
