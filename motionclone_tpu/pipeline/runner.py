"""End-to-end runtime: checkpoints -> prompts -> motion rep -> mp4.

The user-facing orchestration mirroring the reference drivers
(t2v_video_sample.py:14-105, i2v_video_sample.py): model loading, prompt
encoding, per-example extraction + sampling, reference-compatible output
naming.  All accelerator compute is delegated to the jitted functions of
:class:`~motionclone_tpu.pipeline.motionclone.MotionClonePipeline` plus
jitted VAE/CLIP calls here.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import (
    Example,
    InferenceConfig,
    load_model_config,
)
from motionclone_tpu.diffusion.guidance import (
    load_motion_representation,
    load_motion_representation_meta,
    save_motion_representation,
)
from motionclone_tpu.io.video import (
    load_condition_images,
    preprocess_video,
    write_video,
)
from motionclone_tpu.models.sparse_controlnet import scatter_condition
from motionclone_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.models.vae import AutoencoderKL, VAEConfig, sample_latents
from motionclone_tpu.pipeline.motionclone import MotionClonePipeline
from motionclone_tpu.utils import rng
from motionclone_tpu.weights.load import (
    assemble_pipeline_state_dicts,
    clip_params_from_state_dict,
    unet_params_from_state_dict,
    vae_params_from_state_dict,
)

# SD1.5's vae.config.scaling_factor (motionclone_functions.py:32) — the
# default when no vae/config.json overrides it; runtime paths use
# self.vae_cfg.scaling_factor so a checkpoint's declared factor is honored
VAE_SCALING = 0.18215


def motion_rep_meta(cfg: InferenceConfig, seed_motion: int) -> dict:
    """The settings a motion representation depends on — the disk cache's
    validity record (saved into the .npz, compared before reuse)."""
    return {
        "height": cfg.height,
        "width": cfg.width,
        "video_length": cfg.video_length,
        "guidance_blocks": list(cfg.motion_guidance_blocks),
        "add_noise_step": cfg.add_noise_step,
        "seed_motion": seed_motion,
    }


def locate_cached_rep(
    motion_rep_dir: str, stem: str, meta: dict
) -> Tuple[str, Optional[str]]:
    """(save_path, usable_cached_path_or_None) for a video stem.

    A native ``.npz`` is reusable only when its stored meta matches; a
    reference-produced ``.pt``/``.pth`` drop-in carries no meta and is
    trusted as-is (validated structurally on load).
    """
    npz = os.path.join(motion_rep_dir, stem + ".npz")
    if os.path.exists(npz):
        if load_motion_representation_meta(npz) == meta:
            return npz, npz
        return npz, None
    for ext in (".pt", ".pth"):
        alt = os.path.join(motion_rep_dir, stem + ext)
        if os.path.exists(alt):
            return alt, alt
    return npz, None


def _validate_motion_representation(rep, path: str, cfg: InferenceConfig) -> None:
    """Fail fast with an actionable error — instead of an opaque jit shape
    error mid-sampling — when a representation file (possibly a hand-dropped
    reference .pt) does not fit the current configuration."""
    from motionclone_tpu.models.unet_blocks import match_guidance

    if not rep:
        raise ValueError(f"{path}: empty motion representation")
    blocks = tuple(cfg.motion_guidance_blocks)
    for name, (values, _indices) in rep.items():
        if not match_guidance(name, blocks):
            raise ValueError(
                f"{path}: module {name!r} does not match the configured "
                f"motion_guidance_blocks {list(blocks)}; re-extract the "
                f"representation or fix the config"
            )
        if values.shape[-2] != cfg.video_length:
            raise ValueError(
                f"{path}: module {name!r} holds {values.shape[-2]} frames; "
                f"the config expects video_length={cfg.video_length}"
            )


class MotionCloneRuntime:
    """Loaded weights + jitted compute for one workload config."""

    def __init__(
        self,
        pretrained_model_path: str,
        infer_cfg: InferenceConfig,
        *,
        dtype: jnp.dtype = jnp.bfloat16,
        attention_impl: str = "auto",
        config_root: str = ".",
        frame_shard: int = 0,
        frame_shard_mode: str = "shardmap",
        cfg_pair: bool = False,
        uncond_interval: int = 1,
        guidance_interval: int = 1,
        uncond_extrap: float = 0.0,
        step_interval: int = 1,
        step_extrap: float = 0.0,
        weights_cache: str = "",
    ):
        """``frame_shard``: split the frame axis of every video tensor over
        that many local devices (single-video latency scaling,
        parallel.mesh.make_mesh_video).  0 disables.  Requires
        ``video_length % frame_shard == 0``.

        ``frame_shard_mode``: "shardmap" (default) runs every chip's local
        frames with the fused Pallas kernels and explicit temporal-attention
        all_gathers (fastest; t2v AND i2v/controlnet — the controlnet's own
        temporal modules gather across the frame shards too; needs inflated
        GroupNorm); "gspmd" lets XLA partition a pure-XLA graph
        automatically (general fallback).

        ``cfg_pair``: with ``frame_shard``, also split the classifier-free-
        guidance pair over a second ``cfg`` mesh axis of size 2 — a
        (cfg, frames) mesh using 2x frame_shard devices (the composed
        single-video latency layout).

        ``uncond_interval``: > 1 enables the OUTPUT-CHANGING cross-step
        uncond cache (``--approx uncond-cache:K``): the unconditional UNet
        forward refreshes every K steps and is reused in between.
        ``guidance_interval``: > 1 enables the OUTPUT-CHANGING cross-step
        guidance-gradient cache (``--approx guidance-cache:K``): the motion
        guidance's cond fwd+bwd refreshes every K guided steps; in between
        a plain conditional forward supplies the CFG term and the cached
        raw gradient is re-applied with the current ramp.
        ``uncond_extrap``: weight in [0, 1] (``--approx uncond-extrap:K``
        sets 1.0) — linearly extrapolate the cached uncond prediction in
        timestep space from the last two refresh anchors instead of holding
        it, cancelling the first-order cache deviation at no device cost.
        ``step_interval``: > 1 enables the OUTPUT-CHANGING whole-step cache
        (``--approx step-cache:K`` / ``step-extrap:K``): the full step
        (controlnet + uncond + cond/grad) runs every K steps; in between
        the combined noise prediction is extrapolated from the last two
        full steps and only the DDIM update runs.  ``step_extrap`` weights
        that extrapolation (``step-extrap`` sets 1.0, ``step-cache`` 0.0).
        None of these is ever on by default (BASELINE.md parity requires
        the exact path).

        ``weights_cache``: directory for the converted-parameter cache
        (weights.cache) — the torch->flax conversion and merge pipeline runs
        once per unique source set and later startups mmap the result;
        editing any source checkpoint/LoRA/config invalidates the entry."""
        self.infer_cfg = infer_cfg
        self.dtype = dtype
        self.attention_impl = attention_impl
        # --approx knobs are kept on the runtime so every rebuild of the
        # sampling fns (pipeline.sweep's composed modes) threads them too —
        # a sweep must never silently degrade an --approx request to exact
        self.uncond_interval = uncond_interval
        self.guidance_interval = guidance_interval
        self.uncond_extrap = uncond_extrap
        self.step_interval = step_interval
        self.step_extrap = step_extrap
        self.frame_sharding = None
        self.frame_shard_map = None
        self.cfg_pair_sharding = None
        if cfg_pair and not frame_shard:
            raise ValueError(
                "cfg_pair composes with --frame-shard here; for CFG-pair "
                "splitting without frame sharding use the sweep's "
                "--cfg-pair (data, cfg) mode"
            )

        model_config_path = os.path.join(config_root, infer_cfg.model_config)
        self.unet_cfg, self.sched_cfg = load_model_config(model_config_path)
        # honor the checkpoint directory's diffusers config.json files (the
        # reference builds its models from them: from_pretrained_2d reads
        # unet/config.json, AutoencoderKL/CLIPTextModel.from_pretrained read
        # theirs — unet.py:477-490, t2v_video_sample.py:23-25).  Absent
        # files leave the SD1.5 defaults — the shipped model-config YAMLs
        # carry no topology, only motion-module/scheduler kwargs
        from motionclone_tpu.weights.load import apply_unet_diffusers_config

        self.unet_cfg = apply_unet_diffusers_config(
            self.unet_cfg, pretrained_model_path
        )

        if frame_shard == 1:
            # a 1-wide frames axis adds no parallelism but would force the
            # Pallas-free impls — run unsharded instead
            print("frame-shard 1 is a no-op; running unsharded")
            frame_shard = 0
        if frame_shard:
            from motionclone_tpu.parallel.mesh import (
                frame_sharding as _frame_sharding,
                make_mesh_video,
            )

            if frame_shard < 1 or infer_cfg.video_length % frame_shard:
                raise ValueError(
                    f"--frame-shard {frame_shard} must be >= 1 and divide "
                    f"video_length={infer_cfg.video_length}"
                )
            if frame_shard_mode not in ("shardmap", "gspmd"):
                raise ValueError(
                    f"--frame-shard-mode must be 'shardmap' or 'gspmd', "
                    f"got {frame_shard_mode!r}"
                )
            mesh = make_mesh_video(
                frames=frame_shard, cfg=2 if cfg_pair else 1
            )
            unsupported = (
                ""
                if self.unet_cfg.use_inflated_groupnorm
                else "global (non-inflated) GroupNorm statistics"
            )
            if frame_shard_mode == "shardmap" and not unsupported:
                self.frame_shard_map = mesh
            else:
                if frame_shard_mode == "shardmap":
                    print(
                        f"frame-shard: shardmap mode does not support "
                        f"{unsupported}; using gspmd"
                    )
                self.frame_sharding = _frame_sharding(mesh)
                if cfg_pair:
                    from motionclone_tpu.parallel.mesh import (
                        cfg_pair_sharding as _cfg_pair_sharding,
                    )

                    self.cfg_pair_sharding = _cfg_pair_sharding(mesh)
        from motionclone_tpu.weights.load import (
            clip_config_from_dir,
            vae_config_from_dir,
        )

        self.vae_cfg = vae_config_from_dir(pretrained_model_path)
        self.clip_cfg = clip_config_from_dir(pretrained_model_path)

        def j(p):
            return os.path.join(config_root, p) if p else ""

        np_dtype = np.dtype(jnp.dtype(dtype).name) if dtype != jnp.float32 else None

        # converted-parameter cache: key every source file + merge knob, so
        # a hit skips downloads, torch reads, and the whole merge pipeline
        cache_k = None
        cached = None
        if weights_cache:
            from motionclone_tpu.weights.cache import cache_key, load_params
            from motionclone_tpu.weights.load import resolve_diffusers_module_path

            def compute_cache_key():
                sources = [
                    resolve_diffusers_module_path(pretrained_model_path, sub)
                    or os.path.join(pretrained_model_path, sub)
                    for sub in ("unet", "vae", "text_encoder")
                ] + [
                    # the diffusers config.json files shape the model
                    # topology (apply_unet_diffusers_config et al.) — a
                    # config edit must invalidate the converted params
                    os.path.join(pretrained_model_path, sub, "config.json")
                    for sub in ("unet", "vae", "text_encoder")
                ] + [
                    j(infer_cfg.motion_module),
                    j(infer_cfg.dreambooth_path),
                    j(infer_cfg.adapter_lora_path),
                    j(infer_cfg.controlnet_path),
                    j(infer_cfg.controlnet_config),
                    model_config_path,
                ]
                knobs = {
                    "dtype": jnp.dtype(dtype).name,
                    "adapter_lora_scale": infer_cfg.adapter_lora_scale,
                }
                return cache_key(sources, knobs)

            cache_k = compute_cache_key()
            cached = load_params(weights_cache, cache_k)
            required = {"unet", "vae", "text_encoder"}
            if infer_cfg.controlnet_path:
                required.add("controlnet")
            if cached is not None and not required.issubset(cached):
                # structurally incomplete entry (e.g. written by an older
                # runner with fewer components): treat as a miss and
                # reconvert, never crash on a missing key
                cached = None

        if cached is not None:
            unet_params = cached["unet"]
            self.vae_params = cached["vae"]
            self.clip_params = cached["text_encoder"]
        else:
            # fetch well-known hub assets if missing (reference
            # util.py:101-113; raises a FileNotFoundError naming the repo in
            # offline environments)
            from motionclone_tpu.weights.io import auto_download

            if infer_cfg.motion_module:
                auto_download(j(infer_cfg.motion_module))
            if infer_cfg.adapter_lora_path:
                auto_download(j(infer_cfg.adapter_lora_path))
            if infer_cfg.dreambooth_path and not os.path.exists(
                j(infer_cfg.dreambooth_path)
            ):
                auto_download(j(infer_cfg.dreambooth_path), is_dreambooth_lora=True)

            if weights_cache:
                # downloads may have materialized files that were absent
                # when the lookup key was computed; re-fingerprint so the
                # saved entry is keyed by the files as a later run sees them
                cache_k = compute_cache_key()

            sds = assemble_pipeline_state_dicts(
                pretrained_model_path,
                motion_module_path=j(infer_cfg.motion_module),
                dreambooth_path=j(infer_cfg.dreambooth_path),
                adapter_lora_path=j(infer_cfg.adapter_lora_path),
                adapter_lora_scale=infer_cfg.adapter_lora_scale,
            )
            unet_params = unet_params_from_state_dict(
                sds["unet"], self.unet_cfg, dtype=np_dtype
            )
            self.vae_params = vae_params_from_state_dict(
                sds["vae"], self.vae_cfg, dtype=np_dtype
            )
            self.clip_params = clip_params_from_state_dict(
                sds["text_encoder"], self.clip_cfg, dtype=np_dtype
            )

        from motionclone_tpu.io.tokenizer import ClipTokenizer

        self.tokenizer = ClipTokenizer.from_pretrained(
            pretrained_model_path, subfolder="tokenizer"
        )

        self.vae = AutoencoderKL(cfg=self.vae_cfg, dtype=dtype)
        self.clip = CLIPTextModel(cfg=self.clip_cfg, dtype=dtype)

        # i2v: SparseControlNet (reference i2v_video_sample.py:41-59)
        controlnet_apply = None
        cn_params = None
        self.cn_cfg = None
        if infer_cfg.controlnet_path:
            from motionclone_tpu.config import load_yaml
            from motionclone_tpu.models.sparse_controlnet import (
                SparseControlNetConfig,
                SparseControlNetModel,
            )
            from motionclone_tpu.pipeline.motionclone import make_controlnet_apply
            from motionclone_tpu.weights.io import load_state_dict
            from motionclone_tpu.weights.load import (
                controlnet_params_from_state_dict,
            )

            cn_yaml = load_yaml(j(infer_cfg.controlnet_config))
            self.cn_cfg = SparseControlNetConfig.from_yaml_dict(
                cn_yaml.get("controlnet_additional_kwargs", {}), self.unet_cfg
            )
            if cached is not None:
                cn_params = cached["controlnet"]
            else:
                cn_sd = load_state_dict(j(infer_cfg.controlnet_path))
                cn_params = controlnet_params_from_state_dict(
                    cn_sd, self.cn_cfg, dtype=np_dtype
                )
            # the controlnet runs inside the same jitted steps as the UNet:
            # under frame sharding its Pallas attention kernels must be
            # forced off too (GSPMD cannot partition custom calls); an
            # explicit Pallas-free --attention-impl is honored as-is
            cn_impl = attention_impl
            if self.frame_sharding is not None and cn_impl not in (
                "xla", "chunked"
            ):
                cn_impl = "chunked"
            cn_model = SparseControlNetModel(
                cfg=self.cn_cfg,
                attention_impl=cn_impl,
                # shard_map mode: the controlnet's temporal modules
                # all_gather K/V across the frame shards like the UNet's
                frames_axis=(
                    "frames" if self.frame_shard_map is not None else None
                ),
                dtype=dtype,
            )
            controlnet_apply = make_controlnet_apply(cn_model)

        if weights_cache and cached is None:
            from motionclone_tpu.weights.cache import save_params

            save_params(
                weights_cache,
                cache_k,
                {
                    "unet": unet_params,
                    "vae": self.vae_params,
                    "text_encoder": self.clip_params,
                    "controlnet": cn_params,
                },
            )

        if self.frame_sharding is not None or self.frame_shard_map is not None:
            # replicate the heavy parameter trees across the frame mesh so
            # the sharded steps read them locally (no per-step broadcast)
            from motionclone_tpu.parallel.mesh import shard_params

            mesh = (
                self.frame_shard_map
                if self.frame_shard_map is not None
                else self.frame_sharding.mesh
            )
            unet_params = shard_params(unet_params, mesh)
            if cn_params is not None:
                cn_params = shard_params(cn_params, mesh)

        self.pipeline = MotionClonePipeline(
            self.unet_cfg,
            self.sched_cfg,
            infer_cfg,
            unet_params,
            dtype=dtype,
            attention_impl=attention_impl,
            controlnet_apply=controlnet_apply,
            cn_params=cn_params,
            cfg_pair_sharding=self.cfg_pair_sharding,
            frame_sharding=self.frame_sharding,
            frame_shard_map=self.frame_shard_map,
            uncond_interval=uncond_interval,
            guidance_interval=guidance_interval,
            uncond_extrap=uncond_extrap,
            step_interval=step_interval,
            step_extrap=step_extrap,
        )

        self._vae_encode = jax.jit(
            lambda p, x: self.vae.apply(p, x, method=self.vae.encode)
        )
        def _decode_uint8(p, z):
            # decode + [-1,1] -> uint8 on device: the device->host link is
            # slow (~10 MB/s measured), so fetch 1 byte/pixel, not 4
            video = self.vae.apply(p, z, method=self.vae.decode)
            video01 = jnp.clip(video.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
            return jnp.round(video01 * 255.0).astype(jnp.uint8)

        self._vae_decode = jax.jit(_decode_uint8)
        self._clip_apply = jax.jit(lambda p, ids: self.clip.apply(p, ids))

    # ------------------------------------------------------------------
    # text
    # ------------------------------------------------------------------

    def _tokenize(self, texts) -> jnp.ndarray:
        """One padded id batch (B, 77) for a str or a sequence of str."""
        if isinstance(texts, str):
            texts = [texts]
        ids = np.concatenate(
            [
                self.tokenizer.encode_padded(  # (1, 77) each
                    t, max_length=self.tokenizer.model_max_length
                )
                for t in texts
            ],
            axis=0,
        )
        return jnp.asarray(ids, dtype=jnp.int32)

    def encode_prompt(
        self,
        prompt,
        negative_prompt="",
        num_videos_per_prompt: int = 1,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(uncond, cond) CLIP embeddings, each (B*num_videos, 77, 768).

        Full reference surface (pipeline_animation.py:160-247): ``prompt``
        a str or list of str; ``negative_prompt`` a str (broadcast over the
        batch) or a per-prompt list whose length must match; each prompt's
        embedding is repeated ``num_videos_per_prompt`` times consecutively
        (the reference's repeat-then-reshape, :188-190,:235-237)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        if isinstance(negative_prompt, str):
            negatives = [negative_prompt] * len(prompts)
        else:
            negatives = list(negative_prompt)
            if len(negatives) != len(prompts):
                # reference raises on the mismatch (:207-213)
                raise ValueError(
                    f"negative_prompt has batch size {len(negatives)}, but "
                    f"prompt has batch size {len(prompts)} — they must match"
                )
        cond = self._clip_apply(self.clip_params, self._tokenize(prompts))
        uncond = self._clip_apply(self.clip_params, self._tokenize(negatives))
        if num_videos_per_prompt > 1:
            cond = jnp.repeat(cond, num_videos_per_prompt, axis=0)
            uncond = jnp.repeat(uncond, num_videos_per_prompt, axis=0)
        return uncond, cond

    # ------------------------------------------------------------------
    # latents
    # ------------------------------------------------------------------

    def encode_video(self, video: np.ndarray, seed: int) -> jnp.ndarray:
        """Pixels (F, H, W, 3) in [-1,1] -> scaled latents (1, F, h, w, 4)
        with a sampled posterior draw (motionclone_functions.py:31-33)."""
        x = jnp.asarray(video, dtype=self.dtype)[None]
        mean, logvar = self._vae_encode(self.vae_params, x)
        z = sample_latents(mean, logvar, rng.seed_key(seed, rng.VAE_POSTERIOR))
        return z * self.vae_cfg.scaling_factor

    def decode_latents(
        self, latents: jnp.ndarray, *, overlap_chunks: int = 2
    ) -> np.ndarray:
        """Latents -> uint8 RGB frames (F, H, W, 3)
        (pipeline_animation.py:249-263; the [-1,1]->uint8 conversion runs
        on device before the host fetch).

        The VAE decodes frames independently, so the clip is decoded in
        ``overlap_chunks`` frame slices dispatched back-to-back: fetching
        slice i over the slow host link overlaps slice i+1's device
        execution (dispatch is async), hiding most of the decode behind
        the unavoidable ~12.6 MB uint8 fetch.  Falls back to one call when
        frames are mesh-sharded (slicing would fight the sharding) or the
        frame count does not split."""
        z = latents.astype(self.dtype) / self.vae_cfg.scaling_factor
        sharded = (
            self.frame_sharding is not None or self.frame_shard_map is not None
        )
        if (
            overlap_chunks <= 1
            or sharded
            or z.shape[1] % overlap_chunks
        ):
            video = self._vae_decode(self.vae_params, z)
            return np.asarray(video[0])
        parts = jnp.split(z, overlap_chunks, axis=1)
        outs = [self._vae_decode(self.vae_params, p) for p in parts]
        return np.concatenate([np.asarray(o[0]) for o in outs], axis=0)

    # ------------------------------------------------------------------
    # per-example flow (reference t2v_video_sample.py:75-105)
    # ------------------------------------------------------------------

    def run_example(
        self,
        example: Example,
        *,
        motion_rep_dir: str,
        output_dir: str,
        default_seed: int = 2025,
        config_root: str = ".",
        verbose: bool = True,
        resume: bool = False,
    ) -> str:
        """Full flow for one JSONL example; with ``verbose`` prints per-phase
        wall times (extraction / sampling / decode+write — the observable
        units of the jitted pipeline; the reference's tqdm bar iterates the
        python denoise loop, which here is 1-2 device dispatches).

        ``resume``: checkpoint the sampling loop's latent state after each
        chunk under ``output_dir`` and continue an interrupted run from the
        last finished chunk (additive over the reference; the motion
        representation is already resumable via its on-disk cache)."""
        import time as _time

        def _log(phase, t0):
            if verbose:
                print(f"[{example.video_path}] {phase}: "
                      f"{_time.time() - t0:.1f}s", flush=True)
            return _time.time()

        cfg = self.infer_cfg
        os.makedirs(motion_rep_dir, exist_ok=True)
        os.makedirs(output_dir, exist_ok=True)

        seed_motion = example.seed if example.seed is not None else default_seed
        video_path = os.path.join(config_root, example.video_path)
        stem = os.path.splitext(os.path.basename(example.video_path))[0]

        new_prompt = example.new_prompt + cfg.positive_prompt
        use_controlnet = self.cn_cfg is not None
        controlnet_scale = (
            example.controlnet_scale
            if example.controlnet_scale is not None
            else cfg.controlnet_scale
        )

        t0 = _time.time()

        # 1. motion representation (cached on disk, reference :87-90).
        # The cache key is the video stem; the meta record invalidates
        # entries extracted under different settings (resolution, length,
        # guidance blocks, seed) — the reference re-extracts every run, so
        # stale-cache reuse would be a hazard it never has.  A reference
        # .pt/.pth drop-in is used as-is (guidance.py interop).
        rep_meta = motion_rep_meta(cfg, seed_motion)
        rep_path, cached = locate_cached_rep(motion_rep_dir, stem, rep_meta)
        if cached is None and os.path.exists(rep_path) and verbose:
            print(
                f"  cached {os.path.basename(rep_path)} was extracted "
                f"under different settings; re-extracting",
                flush=True,
            )
        if cached is None:
            video = preprocess_video(
                video_path, cfg.height, cfg.width, cfg.video_length
            )
            video_latents = self.encode_video(video, seed_motion)
            uncond_emb, _ = self.encode_prompt("", "")
            cn_cond = None
            if use_controlnet:
                # extraction conditions come from the reference video itself
                # (motionclone_functions.py:46-63)
                idx = list(example.image_index)
                if self.cn_cfg.use_simplified_condition_embedding:
                    frames_cond = video_latents[:, idx]
                else:
                    pixels01 = (jnp.asarray(video)[None] + 1.0) / 2.0
                    frames_cond = pixels01[:, idx].astype(self.dtype)
                cond_t, mask_t = scatter_condition(
                    frames_cond, tuple(idx), cfg.video_length
                )
                cn_cond = (cond_t, mask_t, controlnet_scale)
            rep = self.pipeline.extract_motion_representation(
                video_latents, uncond_emb, seed=seed_motion, cn_cond=cn_cond
            )
            save_motion_representation(rep_path, rep, meta=rep_meta)
            t0 = _log("motion representation extracted", t0)
        rep = load_motion_representation(rep_path)
        _validate_motion_representation(rep, rep_path, cfg)

        # 2. guided sampling
        seed = seed_motion  # reference: seed = seed_motion (:93)
        uncond_emb, cond_emb = self.encode_prompt(new_prompt, cfg.negative_prompt)
        cn_cond = None
        if use_controlnet:
            # sampling conditions come from the example's condition images
            # (motionclone_functions.py:111-128)
            paths = [os.path.join(config_root, p) for p in example.condition_image_paths]
            imgs01 = load_condition_images(paths, cfg.height, cfg.width)
            if self.cn_cfg.use_simplified_condition_embedding:
                x = jnp.asarray(imgs01 * 2.0 - 1.0, dtype=self.dtype)[None]
                mean, logvar = self._vae_encode(self.vae_params, x)
                z = sample_latents(
                    mean, logvar, rng.seed_key(seed, rng.CN_IMAGE_POSTERIOR)
                )
                frames_cond = z * self.vae_cfg.scaling_factor
            else:
                frames_cond = jnp.asarray(imgs01, dtype=self.dtype)[None]
            cond_t, mask_t = scatter_condition(
                frames_cond, tuple(example.image_index), cfg.video_length
            )
            cn_cond = (cond_t, mask_t, controlnet_scale)
        # output name with the reference's scheme (:100-101), fixed before
        # sampling so the resume checkpoint can key off it
        out_name = (
            stem
            + "_"
            + new_prompt.strip().replace(" ", "_")
            + str(seed_motion)
            + "_"
            + str(seed)
            + ".mp4"
        )
        out_path = os.path.join(output_dir, out_name)
        resume_path = (
            os.path.join(output_dir, ".resume_" + out_name + ".npz")
            if resume
            else None
        )
        latents = self.pipeline.sample_latents(
            uncond_emb, cond_emb, rep, seed=seed, cn_cond=cn_cond,
            resume_path=resume_path,
        )
        np.asarray(latents)  # sync so the sampling time is attributed here
        t0 = _log(
            f"guided sampling ({cfg.inference_steps} steps, "
            f"{cfg.guidance_steps} guided)", t0,
        )
        frames = self.decode_latents(latents)

        # 3. write the video
        write_video(out_path, frames, fps=8)
        _log("decode + write", t0)
        return out_path
