"""The MotionClone algorithm as pure jitted functions.

Rebuild of the reference's pipeline layer (reference
motionclone_functions.py:26-257 ``obtain_motion_representation`` /
``sample_video`` / ``single_step_video``), restructured for XLA:

* extraction is one jitted truncated UNet forward + top-1 sparsification;
* sampling is two ``lax.scan`` phases — a guided phase whose body is
  ``jax.value_and_grad`` through the UNet (replacing torch.autograd.grad,
  reference :236) and a vanilla batch-2 CFG phase — with per-step
  timesteps/ramps as scan inputs so the uneven schedule costs nothing;
  each phase executes as a few fixed-size jitted chunks (device dispatches
  stay seconds-long, the compiled scan body is reused across chunks);
* CFG keeps the reference's nonstandard base:
  ``cond + s*(cond - uncond)`` (reference :239,:255 — SURVEY §8 preserve).

The guided body evaluates the conditional UNet *once*, returning
``(loss, noise_pred)`` from the same pass (the reference runs the pass and
keeps activations alive for a separate backward; here linearization does
that structurally), and the no-grad cut after the last guidance block
(reference :629) is automatic: ops feeding only the aux ``noise_pred`` are
not differentiated, so XLA stores no residuals for them.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import InferenceConfig, NoiseScheduleConfig, UNet3DConfig
from motionclone_tpu.diffusion.ddim import (
    DDIMParams,
    add_noise,
    build_timesteps,
    ddim_step,
    make_ddim_params,
    prev_timesteps,
)
from motionclone_tpu.diffusion.guidance import (
    motion_guidance_loss,
    ramp_scales,
    sparsify_top1,
)
from motionclone_tpu.models.unet3d import UNet3DConditionModel
from motionclone_tpu.utils import rng

MotionRep = Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]


def _refresh_flags(n, k, executed=None):
    """Per-chunk refresh schedule for the --approx caches.

    Step 0 of every chunk refreshes (the cache is zero-initialized per
    dispatch, so chunks stay self-contained — this is also what keeps
    ``--resume`` exact), then every k-th step.  Host-computed runtime data
    appended to the scan xs: ONE compiled approx executable serves every
    interval k.

    ``executed`` (the step-cache full-step mask) makes the finer caches
    count EXECUTED steps: a refresh flag raised on a skipped step would be
    silently consumed without running (the uncond / guidance conds only
    evaluate inside ``full_step``), stretching the effective interval —
    e.g. K_u=5 under step-extrap:2 would refresh every 10th step.
    Counting full steps keeps "refresh every K-th executed step" true for
    any (K, K_s) alignment.
    """
    if executed is None:
        return jnp.asarray((np.arange(n) % k) == 0)
    executed = np.asarray(executed, bool)
    idx = np.cumsum(executed) - 1
    return jnp.asarray(executed & ((idx % k) == 0))


def _const_col(n, w):
    # a per-step constant scan column (e.g. the extrapolation weight):
    # runtime data like the refresh flags, so one executable serves
    # every value
    return jnp.full((n,), w, jnp.float32)


def guidance_cut_index(guidance_blocks: Tuple[str, ...]) -> int:
    """Index of the last up-block needed for guidance features.

    The reference parses the trailing int of the last entry
    (motionclone_functions.py:602); same rule here.
    """
    return int(guidance_blocks[-1].rsplit(".", 1)[-1])


def make_controlnet_apply(model):
    """Adapt a SparseControlNetModel to the pipeline's controlnet hook.

    ``cn_cond`` is ``(cond, mask, scale)``: the frame-scattered condition
    tensor, its mask (see models.sparse_controlnet.scatter_condition), and
    the conditioning scale — a python float, or a per-example ``(B,1,1,1,1)``
    array for batched sweeps.  The condition batch broadcasts over the CFG
    pair exactly as the reference's batch-1 cond vs batch-2 latents
    (motionclone_functions.py:190-197).
    """

    def apply(cn_params, latents, t, text_emb, cn_cond):
        cond, mask, scale = cn_cond
        if latents.shape[0] == 2 * cond.shape[0]:
            # CFG pair: tile the condition over both halves
            cond = jnp.concatenate([cond, cond], axis=0)
            mask = jnp.concatenate([mask, mask], axis=0)
            if getattr(scale, "ndim", 0):
                scale = jnp.concatenate([scale, scale], axis=0)
        return model.apply(cn_params, latents, t, text_emb, cond, mask, scale)

    # recorded so make_sampling_fns can reject Pallas-backed controlnets
    # inside GSPMD-sharded graphs (no partitioning rule for custom calls)
    # and controlnets without frame-shard collectives inside shard_map
    apply.attention_impl = model.attention_impl
    apply.frames_axis = model.frames_axis
    return apply


@dataclasses.dataclass(frozen=True)
class SamplingFns:
    """Jitted entry points over (params, arrays) — all pure."""

    extract: Callable[..., MotionRep]
    sample: Callable[..., jnp.ndarray]
    sample_plain: Callable[..., jnp.ndarray]
    sample_plain_probs: Callable[..., Tuple[jnp.ndarray, Dict[str, np.ndarray]]]
    timesteps: np.ndarray
    ddim: DDIMParams
    # the two phase bodies ``sample`` chains, exposed for per-phase timing
    # (bench.py) and profiling tools; signature
    # (params, latents, uncond, cond, rep, cn_params, cn_cond, xs) -> latents
    guided_chunk: Optional[Callable] = None
    vanilla_chunk: Optional[Callable] = None
    # full per-phase scan inputs: (guided xs tuple, vanilla xs tuple)
    phase_xs: Optional[Tuple[Tuple, Tuple]] = None


def make_sampling_fns(
    unet_cfg: UNet3DConfig,
    sched_cfg: NoiseScheduleConfig,
    infer_cfg: InferenceConfig,
    *,
    dtype: jnp.dtype = jnp.bfloat16,
    attention_impl: str = "auto",
    guided_attention_impl: Optional[str] = None,
    remat_guided: bool = False,
    controlnet_apply: Optional[Callable] = None,
    cfg_pair_sharding=None,
    frame_sharding=None,
    frame_shard_map=None,
    uncond_interval: int = 1,
    guidance_interval: int = 1,
    uncond_extrap: float = 0.0,
    step_interval: int = 1,
    step_extrap: float = 0.0,
) -> SamplingFns:
    """Build the jitted extract/sample functions for one workload config.

    ``controlnet_apply(params_cn, noisy_latents, t, text_emb) ->
    (down_residuals, mid_residual)`` is an optional hook for the i2v
    workloads (SparseCtrl); None for t2v.

    ``cfg_pair_sharding``: optional ``NamedSharding`` (see
    parallel.mesh.cfg_pair_sharding) constraining batch-2B ``[uncond,
    cond]`` tensors so the CFG pair splits over the mesh's ``cfg`` axis —
    XLA then runs the two UNet evaluations on separate chips and recombines
    the pair over ICI (SURVEY §2.5).  This applies to both phases: the
    vanilla batch-2 forward, and the guided step, which switches to a
    batch-2 pair form (``guided_step_pair``) so the conditional
    forward+backward and the unconditional forward overlap across the
    ``cfg`` groups instead of running serially on every chip.

    ``frame_sharding``: optional ``NamedSharding`` (see
    parallel.mesh.frame_sharding) splitting the **frame axis** of every
    (B, F, H, W, C) video tensor over the mesh's ``frames`` axis — the
    single-video latency axis (additive over the reference, SURVEY §2.5).
    Convolutions, GroupNorms, and spatial attention are per-frame
    independent (the reference folds frames into batch, resnet.py:10-29,
    attention.py:99), so they run fully local; only the temporal motion
    modules mix frames, and GSPMD emits those collectives over ICI.
    Because GSPMD cannot partition Pallas custom calls, enabling this
    forces the pure-XLA compute paths unless an explicit non-Pallas impl
    ("xla"/"chunked") was requested.  Combine with ``cfg_pair_sharding``
    over a ``(cfg, frames)`` mesh (parallel.mesh.make_mesh_video) to also
    split the CFG pair.

    ``frame_shard_map``: optional ``Mesh`` with a ``frames`` axis — the
    **explicit-collective** variant of frame sharding.  The whole scan
    chunk runs under ``jax.shard_map``: every chip executes the per-frame
    work (spatial transformers, resnets — the bulk of the cost) on its
    local frames with the fused Pallas kernels intact (unlike the GSPMD
    path, which must fall back to pure-XLA ops everywhere); the temporal
    motion modules ``all_gather`` keys/values across the frame shards over
    ICI and run the rectangular (f_local x f_global) packed Pallas temporal
    kernel on the gathered blocks (models.motion_module.VersatileAttention
    with ``frames_axis``); each shard differentiates its local partial of
    the guidance loss — the cross-shard terms arrive through the
    ``all_gather`` transpose, so gradients compose exactly.  Requirements:
    no controlnet (use the GSPMD path for
    i2v), ``use_inflated_groupnorm`` (per-frame statistics stay
    shard-local), and ``video_length`` divisible by the ``frames`` axis
    size.  Mutually exclusive with ``frame_sharding``.
    """
    if frame_shard_map is not None:
        if frame_sharding is not None:
            raise ValueError(
                "frame_shard_map and frame_sharding are mutually exclusive"
            )
        if cfg_pair_sharding is not None:
            raise ValueError(
                "cfg_pair_sharding is the GSPMD mechanism; under "
                "frame_shard_map the CFG pair composes via a 'cfg' mesh "
                "axis of size 2 (parallel.mesh.make_mesh_video(frames, "
                "cfg=2))"
            )
        if controlnet_apply is not None and (
            getattr(controlnet_apply, "frames_axis", None) != "frames"
        ):
            raise ValueError(
                "frame_shard_map needs a frame-sharded controlnet: build "
                "SparseControlNetModel with frames_axis='frames' (its "
                "temporal modules must all_gather K/V across the frame "
                "shards like the UNet's)"
            )
        if "frames" not in frame_shard_map.axis_names:
            raise ValueError(
                f"frame_shard_map mesh needs a 'frames' axis, has "
                f"{frame_shard_map.axis_names}"
            )
        _cfg_axis = dict(frame_shard_map.shape).get("cfg", 1)
        if _cfg_axis not in (1, 2):
            raise ValueError(
                f"frame_shard_map 'cfg' axis must have size 1 or 2 (the "
                f"CFG pair), got {_cfg_axis}"
            )
        if not unet_cfg.use_inflated_groupnorm:
            raise ValueError(
                "frame_shard_map requires use_inflated_groupnorm (global "
                "GroupNorm statistics would be computed per shard)"
            )
    # explicit-SPMD CFG-pair composition: mesh ('cfg'=2, 'frames'=N)
    smap_cfg_pair = (
        frame_shard_map is not None
        and dict(frame_shard_map.shape).get("cfg", 1) == 2
    )
    # --approx cross-step caches (OUTPUT-CHANGING: opt-in only, never the
    # default path — BASELINE.md parity forbids it there):
    # * uncond_interval > 1: the unconditional UNet forward refreshes every
    #   K steps and the cached prediction is reused in between (both
    #   phases; the conditional pass stays exact);
    # * guidance_interval > 1: the motion-guidance gradient (the expensive
    #   cond fwd+bwd) refreshes every K guided steps; in between a plain
    #   (fused-kernel) conditional forward supplies the CFG term and the
    #   cached RAW gradient is re-applied with the current step's
    #   warm-up/cool-down ramp.
    # * uncond_extrap (weight in [0, 1], default 0): instead of holding
    #   the cached uncond prediction constant, linearly extrapolate it in
    #   timestep space from the last two refresh anchors — cancels the
    #   first-order drift of the hold-the-cache deviation for free (a few
    #   elementwise ops on one (B,F,H,W,4) buffer).
    # * step_interval > 1: the coarsest cache — the FULL step (controlnet +
    #   uncond + cond/grad) runs every K steps; in between the final
    #   combined noise prediction is extrapolated from the last two full
    #   steps' anchors and only the DDIM update runs (a linear-multistep
    #   solver on skip steps), with the cached raw guidance gradient
    #   re-applied under the current step's ramp.  Composes with the finer
    #   caches: they act on the steps the step cache does run.
    # * step_extrap: the extrapolation weight for the step cache's noise
    #   prediction (0 = zero-order hold, 1 = first-order).
    # Intervals and the extrapolation weights are runtime data (per-step
    # scan-xs columns), so one compiled approx executable serves every
    # (K_u, K_g, K_s, w) point.
    if uncond_interval < 1:
        raise ValueError(f"uncond_interval must be >= 1, got {uncond_interval}")
    if guidance_interval < 1:
        raise ValueError(
            f"guidance_interval must be >= 1, got {guidance_interval}"
        )
    if step_interval < 1:
        raise ValueError(f"step_interval must be >= 1, got {step_interval}")
    if uncond_extrap and uncond_interval == 1:
        raise ValueError(
            "uncond_extrap extrapolates the uncond cache: build "
            "make_sampling_fns(..., uncond_interval>1) to enable it"
        )
    if step_extrap and step_interval == 1:
        raise ValueError(
            "step_extrap extrapolates the step cache: build "
            "make_sampling_fns(..., step_interval>1) to enable it"
        )
    approx_guided = (
        uncond_interval > 1 or guidance_interval > 1 or step_interval > 1
    )
    # the vanilla phase has two cache levers: the uncond forward and the
    # whole-step skip (the guidance cache is a guided-phase concept)
    approx_vanilla = uncond_interval > 1 or step_interval > 1
    # the whole-step skip wraps the step body in an outer lax.cond and
    # threads noise-pred anchors through the carry; builds without it keep
    # the plain approx graph (same executables/numerics as before), so the
    # step cache is a build-time opt-in like the other approx modes
    step_cache = step_interval > 1
    if approx_guided and (cfg_pair_sharding is not None or smap_cfg_pair):
        raise ValueError(
            "the cross-step caches (--approx) do not compose with CFG-pair "
            "splitting: the pair formulations evaluate both halves jointly"
        )

    def _check_smap_cn_cond(cn_cond):
        # shard_map in_specs are static: with a controlnet configured the
        # cn_cond slot's sharding is a (frames, frames, replicated) triple,
        # so per-call None (an example without condition images) cannot be
        # fed through — fail with guidance instead of a pytree error
        if (
            frame_shard_map is not None
            and controlnet_apply is not None
            and cn_cond is None
        ):
            raise ValueError(
                "frame-sharded (shard_map) controlnet pipelines need "
                "cn_cond on every call; run unconditioned examples "
                "unsharded or via the GSPMD mode"
            )

    frames_axis = "frames" if frame_shard_map is not None else None
    ddim = make_ddim_params(sched_cfg)
    if guided_attention_impl is None:
        # the differentiated pass streams 64x64 attention through the Pallas
        # flash kernel: XLA's attention backward would materialize the full
        # (B, H, 4096, 4096) probability tensor (4.3 GB) and overflow HBM
        guided_attention_impl = (
            "grad-safe" if jax.default_backend() == "tpu" else attention_impl
        )
    plain_impl = attention_impl
    if attention_impl == "auto" and jax.default_backend() == "tpu":
        # non-differentiated passes run whole transformer blocks as single
        # Pallas kernels (ops/fused_block.py)
        plain_impl = "fused"
    if frame_sharding is not None:
        # GSPMD has no partitioning rule for Pallas custom calls: every op
        # in the frame-sharded graph must be pure XLA.  Default to the
        # query-chunked path, which bounds the materialized attention
        # logits to (chunk x kv) per head — at 512^2 the plain einsum path
        # would materialize multi-GB (BF/N, heads, 4096, 4096) probability
        # tensors per chip.  Explicit "xla"/"chunked" are honored.
        if attention_impl in ("flash", "fused"):
            # an explicitly requested Pallas backend cannot run sharded —
            # say so instead of silently measuring a different backend
            print(
                f"frame sharding (gspmd): attention impl {attention_impl!r} "
                f"is Pallas-backed and cannot be partitioned; using 'chunked'"
            )
        if plain_impl not in ("xla", "chunked"):
            plain_impl = "chunked"
        if guided_attention_impl not in ("xla", "chunked"):
            guided_attention_impl = "chunked"
        cn_impl = getattr(controlnet_apply, "attention_impl", None)
        if cn_impl is not None and cn_impl not in ("xla", "chunked"):
            raise ValueError(
                f"frame_sharding requires a Pallas-free controlnet: build "
                f"SparseControlNetModel with attention_impl='chunked' or "
                f"'xla' (got {cn_impl!r})"
            )
    cut = guidance_cut_index(infer_cfg.motion_guidance_blocks)
    guided_unet = UNet3DConditionModel(
        cfg=unet_cfg,
        guidance_blocks=tuple(infer_cfg.motion_guidance_blocks),
        attention_impl=guided_attention_impl,
        frames_axis=frames_axis,
        # up blocks past the last guidance block feed only the (aux)
        # noise_pred, never the loss: run them stop-gradient with the
        # forward-only fused kernels (reference's no_grad split, :629)
        post_guidance_cut=cut if plain_impl == "fused" else None,
        post_guidance_impl=plain_impl,
        dtype=dtype,
    )
    plain_unet = UNet3DConditionModel(
        cfg=unet_cfg, guidance_blocks=(), attention_impl=plain_impl,
        frames_axis=frames_axis, dtype=dtype,
    )

    timesteps = build_timesteps(
        infer_cfg.inference_steps,
        sched_cfg.num_train_timesteps,
        guidance_steps=infer_cfg.guidance_steps,
        guidance_fraction=infer_cfg.guidance_fraction,
        steps_offset=sched_cfg.steps_offset,
        spacing="uneven",
    )
    t_prev = prev_timesteps(timesteps)
    ramps = ramp_scales(
        infer_cfg.guidance_steps, infer_cfg.warm_up_steps, infer_cfg.cool_up_steps
    )
    g = infer_cfg.guidance_steps

    ts_guided = jnp.asarray(timesteps[:g])
    tp_guided = jnp.asarray(t_prev[:g])
    ramps_guided = jnp.asarray(ramps)
    ts_vanilla = jnp.asarray(timesteps[g:])
    tp_vanilla = jnp.asarray(t_prev[g:])

    # frame-axis sharding (single-video latency): constrain (B, F, H, W, C)
    # tensors at the step boundaries; GSPMD propagates through the UNet
    pair_video_sharding = None
    if cfg_pair_sharding is not None and frame_sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        # batch-2B pair tensors: cfg groups on the batch axis AND frame
        # splits within each group
        pair_video_sharding = NamedSharding(
            frame_sharding.mesh,
            PartitionSpec(cfg_pair_sharding.spec[0], frame_sharding.spec[1]),
        )

    def frame_constrain(x):
        if frame_sharding is None or x is None:
            return x
        return jax.lax.with_sharding_constraint(x, frame_sharding)

    # ------------------------------------------------------------------
    # extraction (reference motionclone_functions.py:26-82)
    # ------------------------------------------------------------------

    def _extract(params, video_latents, noise, uncond_emb, cn_params=None,
                 cn_cond=None):
        video_latents = frame_constrain(video_latents)
        noisy = add_noise(ddim, infer_cfg.add_noise_step, video_latents, noise)
        t = jnp.asarray(infer_cfg.add_noise_step)
        down_res, mid_res = None, None
        if controlnet_apply is not None and cn_cond is not None:
            # i2v extraction runs the controlnet on the noisy reference
            # latents with the uncond embedding (reference :46-72)
            down_res, mid_res = controlnet_apply(
                cn_params, noisy, t, uncond_emb, cn_cond
            )
        _, probs = guided_unet.apply(
            params,
            noisy,
            t,
            uncond_emb,
            down_block_residuals=down_res,
            mid_block_residual=mid_res,
            max_up_block=cut,
        )
        return {k: sparsify_top1(p) for k, p in probs.items()}

    # shard_map wiring: video tensors split on the frame axis, motion-rep
    # arrays on their query-frame axis (index 3 of (B, S, heads, F, 1));
    # everything else — params, embeddings, timesteps — is replicated
    if frame_shard_map is not None:
        from jax.sharding import PartitionSpec as _P

        # an optional 'data' mesh axis shards the example batch dimension
        # (shard_map sweeps: mesh ('data', 'frames') or
        # ('data', 'cfg', 'frames')); without it the batch is replicated
        _data = "data" if "data" in frame_shard_map.axis_names else None
        _vid = _P(_data, "frames")
        _rep = _P(_data, None, None, "frames", None)
        _emb = _P(_data)
        # controlnet conditioning (cond, mask, scale): the frame-scattered
        # condition tensors shard like video tensors; the scale replicates
        # (a python float) unless the batch is data-sharded, in which case
        # it must be the per-example (B,1,1,1,1) array the sweep builds.
        # Without a controlnet the cn_cond slot is always None — an empty
        # pytree any spec prefixes.
        # the scale spec must be length-0 for a scalar (python-float) scale;
        # under a data mesh it must be the per-example (B,1,1,1,1) array
        _scale = _P("data") if _data else _P()
        _cn_cond = (
            (_vid, _vid, _scale) if controlnet_apply is not None else _P()
        )

        def _smap(fn, in_specs, out_specs):
            # check_vma=False: the Pallas kernels inside (flash/fused/
            # temporal) declare no varying-mesh-axes metadata on their
            # out_shapes, which the vma checker rejects.  Consequences the
            # sharded code is written for: no replication checking (spec
            # mistakes become silent numerics, guarded by the equivalence
            # tests instead), and the guidance loss must NOT psum its value
            # (see diffusion.guidance.motion_guidance_loss — the scan
            # discards the per-shard partial loss anyway)
            return jax.jit(
                jax.shard_map(
                    fn, mesh=frame_shard_map,
                    in_specs=in_specs, out_specs=out_specs,
                    check_vma=False,
                )
            )

        _extract_smap = _smap(
            _extract,
            (_P(), _vid, _vid, _emb, _P(), _cn_cond),
            _rep,
        )

        def extract(params, video_latents, noise, uncond_emb,
                    cn_params=None, cn_cond=None):
            _check_smap_cn_cond(cn_cond)
            return _extract_smap(
                params, video_latents, noise, uncond_emb, cn_params, cn_cond
            )
    else:
        extract = jax.jit(_extract)

    # ------------------------------------------------------------------
    # sampling (reference motionclone_functions.py:102-257)
    # ------------------------------------------------------------------

    def _unet_loss(params, latents, t, cond_emb, motion_rep, cn_res):
        latents = frame_constrain(latents)
        down_res, mid_res = cn_res
        noise_pred, probs = guided_unet.apply(
            params,
            latents,
            t,
            cond_emb,
            down_block_residuals=down_res,
            mid_block_residual=mid_res,
        )
        loss = infer_cfg.motion_guidance_weight * motion_guidance_loss(
            probs, motion_rep, axis_name=frames_axis
        )
        return loss, noise_pred

    if remat_guided:
        # Optional memory bound: save matmul outputs, recompute elementwise
        # chains (the analog of the reference's fp16 + partial-no-grad
        # memory cap, SURVEY §7 hard part 2).  Off by default: with the
        # grad-safe attention impl the residuals fit v5e HBM at 512^2/16f,
        # and remat costs ~35% per guided step in recompute.
        _unet_loss = jax.checkpoint(
            _unet_loss,
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
            static_argnums=(),
        )

    grad_fn = jax.value_and_grad(_unet_loss, argnums=1, has_aux=True)

    def _make_steps(
        params,
        uncond_emb,
        cond_emb,
        motion_rep: MotionRep,
        cn_params,
        cn_cond,
    ):
        cfg_scale = infer_cfg.cfg_scale

        def controlnet_residuals(latents, t, emb_pair):
            # cn_cond=None on a controlnet-configured pipeline means "no
            # conditioning for this example" — same contract as _extract
            if controlnet_apply is None or cn_cond is None:
                return (None, None), (None, None)
            # batched CFG-pair controlnet forward, residuals split per half
            # (reference :190-208)
            b = latents.shape[0]
            lat2 = jnp.concatenate([latents, latents], axis=0)
            down, mid = controlnet_apply(cn_params, lat2, t, emb_pair, cn_cond)
            down_u = tuple(d[:b] for d in down)
            down_c = tuple(d[b:] for d in down)
            return (down_u, mid[:b]), (down_c, mid[b:])

        emb_pair = jnp.concatenate([uncond_emb, cond_emb], axis=0)

        def guided_step(latents, step):
            t, tp, ramp = step
            latents = frame_constrain(latents)
            cn_u, cn_c = controlnet_residuals(latents, t, emb_pair)
            uncond_pred, _ = plain_unet.apply(
                params,
                latents,
                t,
                uncond_emb,
                down_block_residuals=cn_u[0],
                mid_block_residual=cn_u[1],
            )
            (loss, cond_pred), grad = grad_fn(
                params, latents, t, cond_emb, motion_rep, cn_c
            )
            grad = grad * ramp  # loss ramps scale the score linearly
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            new_latents = ddim_step(
                ddim, noise_pred, t, tp, latents, score=grad, guidance_scale=1.0
            )
            return frame_constrain(new_latents), loss

        def pair_constrain(x):
            if x is None:
                return x
            if cfg_pair_sharding is None:
                # frame-only sharding: video tensors (incl. batch-2B pairs)
                # still split on the frame axis
                return frame_constrain(x) if x.ndim == 5 else x
            s = cfg_pair_sharding
            if pair_video_sharding is not None and x.ndim == 5:
                s = pair_video_sharding
            return jax.lax.with_sharding_constraint(x, s)

        def guided_step_pair(latents, step):
            """Guided step as one CFG-pair computation, sharded over ``cfg``.

            Multi-chip form of ``guided_step``: the batch-2B ``[uncond,
            cond]`` evaluation splits over the mesh's ``cfg`` axis, so the
            conditional forward+backward and the unconditional work run on
            *separate chips concurrently* — the per-chip critical path drops
            from (uncond fwd + cond fwd/bwd) serial to one fwd+bwd.  The
            loss reads only the cond half's probability maps, so the uncond
            half's cotangent is structurally zero and the concat VJP's
            half-sum reduces to the cond gradient exactly.  Single-chip
            keeps the serial ``guided_step`` — the batch-2 backward would
            be pure overhead there.
            """
            t, tp, ramp = step
            latents = frame_constrain(latents)
            b = latents.shape[0]
            if controlnet_apply is not None:
                lat2_cn = jnp.concatenate([latents, latents], axis=0)
                cn2 = controlnet_apply(cn_params, lat2_cn, t, emb_pair, cn_cond)
                down2 = tuple(pair_constrain(d) for d in cn2[0])
                mid2 = pair_constrain(cn2[1])
            else:
                down2, mid2 = None, None

            def pair_loss(lat):
                lat2 = pair_constrain(jnp.concatenate([lat, lat], axis=0))
                pred2, probs2 = guided_unet.apply(
                    params,
                    lat2,
                    t,
                    pair_constrain(emb_pair),
                    down_block_residuals=down2,
                    mid_block_residual=mid2,
                )
                probs_cond = {k: p[b:] for k, p in probs2.items()}
                loss = infer_cfg.motion_guidance_weight * motion_guidance_loss(
                    probs_cond, motion_rep
                )
                return loss, pair_constrain(pred2)

            (loss, pred2), grad = jax.value_and_grad(pair_loss, has_aux=True)(
                latents
            )
            grad = grad * ramp
            uncond_pred, cond_pred = pred2[:b], pred2[b:]
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            new_latents = ddim_step(
                ddim, noise_pred, t, tp, latents, score=grad, guidance_scale=1.0
            )
            return frame_constrain(new_latents), loss

        def guided_step_smap_pair(latents, step):
            """Guided step inside ``shard_map`` over a ('cfg', 'frames')
            mesh — the explicit-SPMD composition of the CFG pair with frame
            sharding (the shard_map analog of ``guided_step_pair``).

            Both cfg groups run the SAME fwd+bwd program, each on its
            half's embedding; the halves then combine with masked psums
            over 'cfg'.  The uncond group's gradient is masked to zero —
            its backward is wasted FLOPs, but it runs concurrently with the
            cond group's, so the per-chip critical path is one fwd+bwd
            (vs the serial uncond-fwd + cond-fwd/bwd), and the branchless
            program keeps every chip's schedule uniform.  The psums sit
            OUTSIDE the differentiated function, so the check_vma=False
            double-count hazard (see motion_guidance_loss) does not apply.
            """
            t, tp, ramp = step
            is_cond = jax.lax.axis_index("cfg") == 1

            def only_cond(x):
                return jax.lax.psum(
                    jnp.where(is_cond, x, jnp.zeros_like(x)), "cfg"
                )

            def only_uncond(x):
                return jax.lax.psum(
                    jnp.where(is_cond, jnp.zeros_like(x), x), "cfg"
                )

            emb = jnp.where(is_cond, cond_emb, uncond_emb)
            if controlnet_apply is not None and cn_cond is not None:
                # batch-B controlnet on the local half's embedding (the
                # serial step's batched pair splits across the cfg groups)
                cn_res = controlnet_apply(cn_params, latents, t, emb, cn_cond)
            else:
                cn_res = (None, None)
            (loss, pred), grad = grad_fn(
                params, latents, t, emb, motion_rep, cn_res
            )
            uncond_pred = only_uncond(pred)
            cond_pred = only_cond(pred)
            grad = only_cond(grad) * ramp
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            new_latents = ddim_step(
                ddim, noise_pred, t, tp, latents, score=grad, guidance_scale=1.0
            )
            return new_latents, loss

        def vanilla_step_smap_pair(latents, step):
            """Vanilla CFG step with the pair split over the 'cfg' mesh
            axis inside ``shard_map``: each group runs a batch-B forward on
            its half's embedding (halving the per-chip vanilla cost) and
            the halves combine with masked psums."""
            t, tp = step
            is_cond = jax.lax.axis_index("cfg") == 1

            def half(c, x):
                return jax.lax.psum(
                    jnp.where(c, x, jnp.zeros_like(x)), "cfg"
                )

            emb = jnp.where(is_cond, cond_emb, uncond_emb)
            if controlnet_apply is not None and cn_cond is not None:
                down_res, mid_res = controlnet_apply(
                    cn_params, latents, t, emb, cn_cond
                )
            else:
                down_res, mid_res = None, None
            pred, _ = plain_unet.apply(
                params,
                latents,
                t,
                emb,
                down_block_residuals=down_res,
                mid_block_residual=mid_res,
            )
            uncond_pred = half(~is_cond, pred)
            cond_pred = half(is_cond, pred)
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            return ddim_step(ddim, noise_pred, t, tp, latents), jnp.zeros(())

        if cfg_pair_sharding is not None:
            guided_step = guided_step_pair

        def vanilla_step(latents, step):
            t, tp = step
            latents = frame_constrain(latents)
            cn_u, cn_c = controlnet_residuals(latents, t, emb_pair)
            if cn_u[0] is None:
                down_res, mid_res = None, None
            else:
                down_res = tuple(
                    pair_constrain(jnp.concatenate([u, c], axis=0))
                    for u, c in zip(cn_u[0], cn_c[0])
                )
                mid_res = pair_constrain(
                    jnp.concatenate([cn_u[1], cn_c[1]], axis=0)
                )
            b = latents.shape[0]
            lat2 = pair_constrain(jnp.concatenate([latents, latents], axis=0))
            pred2, _ = plain_unet.apply(
                params,
                lat2,
                t,
                pair_constrain(emb_pair),
                down_block_residuals=down_res,
                mid_block_residual=mid_res,
            )
            pred2 = pair_constrain(pred2)
            uncond_pred, cond_pred = pred2[:b], pred2[b:]
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            new_latents = ddim_step(ddim, noise_pred, t, tp, latents)
            return frame_constrain(new_latents), jnp.zeros(())

        def _extrapolate(u_last, u_prev, t_last, t_prev, n_ref, t_f, w):
            # first-order extrapolation of the cached uncond prediction in
            # timestep space from the last two refresh anchors: u(t) drifts
            # smoothly along the DDIM trajectory, so the linear term
            # cancels most of the hold-the-cache deviation.  w=0 reduces to
            # the plain held cache; the slope is masked until two anchors
            # exist (n_ref >= 2).  f32 arithmetic: bf16 anchor differences
            # are the signal being amplified.
            denom = t_last - t_prev
            slope = (
                u_last.astype(jnp.float32) - u_prev.astype(jnp.float32)
            ) / jnp.where(denom == 0.0, 1.0, denom)
            ok = jnp.where(n_ref >= 2.0, 1.0, 0.0)
            est = u_last.astype(jnp.float32) + (w * ok) * slope * (
                t_f - t_last
            )
            return est.astype(u_last.dtype)

        def guided_step_approx(carry, step):
            """Guided step with the cross-step caches: carry is (latents,
            uncond-cache anchors (u_last, u_prev, t_last, t_prev, n_ref),
            cached raw guidance gradient, noise-pred anchors (np_last,
            np_prev, tn_last, tn_prev, n_np)); the per-step scan inputs
            ``refresh_u`` / ``refresh_g`` / ``refresh_s`` decide between
            fresh work and the caches, and ``extrap_w`` / ``step_w`` weight
            the first-order extrapolations (0 = plain held cache).  When
            ``refresh_s`` is False the ENTIRE step's model work (controlnet
            + uncond + cond/grad) is skipped: the combined noise prediction
            is extrapolated from the last two full steps and the cached raw
            gradient is re-applied under this step's ramp, so only the DDIM
            update runs.  With all flags True this computes the exact
            step's math (what lets one executable serve every interval,
            including 1).

            Builds without the step cache (``step_interval == 1``) carry
            no noise-pred anchors and take no ``refresh_s``/``step_w``
            columns — the step body traces inline (no outer cond), so the
            compiled graph is exactly the finer-caches-only one."""
            if step_cache:
                (
                    latents,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    prev_g,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = carry
                (
                    t, tp, ramp,
                    refresh_u, refresh_g, extrap_w, refresh_s, step_w,
                ) = step
            else:
                (
                    latents,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    prev_g,
                ) = carry
                t, tp, ramp, refresh_u, refresh_g, extrap_w = step
                z0 = jnp.zeros((), jnp.float32)
                np_last = np_prev = jnp.zeros_like(latents)
                tn_last = tn_prev = n_np = z0
                step_w = z0
            latents = frame_constrain(latents)
            t_f = t.astype(jnp.float32)

            def full_step(operand):
                (
                    lat,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    prev_g,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = operand
                cn_u, cn_c = controlnet_residuals(lat, t, emb_pair)

                def fresh_u(op):
                    lat, u_last, u_prev, t_last, t_prev, n_ref = op
                    up, _ = plain_unet.apply(
                        params,
                        lat,
                        t,
                        uncond_emb,
                        down_block_residuals=cn_u[0],
                        mid_block_residual=cn_u[1],
                    )
                    return up, up, u_last, t_f, t_last, n_ref + 1.0

                def stale_u(op):
                    lat, u_last, u_prev, t_last, t_prev, n_ref = op
                    est = _extrapolate(
                        u_last, u_prev, t_last, t_prev, n_ref, t_f, extrap_w
                    )
                    return est, u_last, u_prev, t_last, t_prev, n_ref

                (
                    uncond_pred, u_last, u_prev, t_last, t_prev, n_ref,
                ) = jax.lax.cond(
                    refresh_u, fresh_u, stale_u,
                    (lat, u_last, u_prev, t_last, t_prev, n_ref),
                )

                def fresh_g(op):
                    lat, _ = op
                    (loss, cond_pred), raw = grad_fn(
                        params, lat, t, cond_emb, motion_rep, cn_c
                    )
                    return cond_pred, raw, loss.astype(jnp.float32)

                def stale_g(op):
                    # cond_pred is still needed every full step (it is the
                    # CFG base); a plain fused forward supplies it while
                    # the raw gradient comes from the cache
                    lat, pg = op
                    cond_pred, _ = plain_unet.apply(
                        params,
                        lat,
                        t,
                        cond_emb,
                        down_block_residuals=cn_c[0],
                        mid_block_residual=cn_c[1],
                    )
                    return cond_pred, pg, jnp.zeros((), jnp.float32)

                cond_pred, raw_grad, loss = jax.lax.cond(
                    refresh_g, fresh_g, stale_g, (lat, prev_g)
                )
                noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
                return (
                    noise_pred, raw_grad, loss,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    noise_pred, np_last, t_f, tn_last, n_np + 1.0,
                )

            def skip_step(operand):
                (
                    lat,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    prev_g,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = operand
                est = _extrapolate(
                    np_last, np_prev, tn_last, tn_prev, n_np, t_f, step_w
                )
                return (
                    est, prev_g, jnp.zeros((), jnp.float32),
                    u_last, u_prev, t_last, t_prev, n_ref,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                )

            operand = (
                latents,
                u_last, u_prev, t_last, t_prev, n_ref,
                prev_g,
                np_last, np_prev, tn_last, tn_prev, n_np,
            )
            if step_cache:
                res = jax.lax.cond(refresh_s, full_step, skip_step, operand)
            else:
                # inline trace: the anchor outputs are never carried, so
                # XLA dead-code-eliminates them — the old approx graph
                res = full_step(operand)
            (
                noise_pred, raw_grad, loss,
                u_last, u_prev, t_last, t_prev, n_ref,
                np_last, np_prev, tn_last, tn_prev, n_np,
            ) = res
            grad = raw_grad * ramp
            new_latents = ddim_step(
                ddim, noise_pred, t, tp, latents, score=grad, guidance_scale=1.0
            )
            new_carry = (
                frame_constrain(new_latents),
                u_last, u_prev, t_last, t_prev, n_ref,
                raw_grad,
            )
            if step_cache:
                new_carry = new_carry + (
                    np_last, np_prev, tn_last, tn_prev, n_np,
                )
            return new_carry, loss

        def vanilla_step_approx(carry, step):
            """Vanilla CFG step with the cross-step caches: on uncond
            refresh steps the standard batch-2 pair runs; in between a
            batch-1 conditional forward pairs with the cached (optionally
            extrapolated) uncond prediction.  When ``refresh_s`` is False
            the whole step's model work is skipped and the combined noise
            prediction is extrapolated from the last two full steps.

            Builds without the step cache carry no noise-pred anchors and
            take no ``refresh_s``/``step_w`` columns (see
            guided_step_approx)."""
            if step_cache:
                (
                    latents,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = carry
                t, tp, refresh, extrap_w, refresh_s, step_w = step
            else:
                latents, u_last, u_prev, t_last, t_prev, n_ref = carry
                t, tp, refresh, extrap_w = step
                z0 = jnp.zeros((), jnp.float32)
                np_last = np_prev = jnp.zeros_like(latents)
                tn_last = tn_prev = n_np = z0
                step_w = z0
            latents = frame_constrain(latents)
            b = latents.shape[0]
            t_f = t.astype(jnp.float32)

            def full_step(operand):
                (
                    lat,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = operand
                cn_u, cn_c = controlnet_residuals(lat, t, emb_pair)

                def fresh(op):
                    lat, u_last, u_prev, t_last, t_prev, n_ref = op
                    lat2 = jnp.concatenate([lat, lat], axis=0)
                    if cn_u[0] is None:
                        down_res, mid_res = None, None
                    else:
                        down_res = tuple(
                            jnp.concatenate([u, c], axis=0)
                            for u, c in zip(cn_u[0], cn_c[0])
                        )
                        mid_res = jnp.concatenate([cn_u[1], cn_c[1]], axis=0)
                    pred2, _ = plain_unet.apply(
                        params,
                        lat2,
                        t,
                        emb_pair,
                        down_block_residuals=down_res,
                        mid_block_residual=mid_res,
                    )
                    return (
                        pred2[:b], pred2[b:],
                        pred2[:b], u_last, t_f, t_last, n_ref + 1.0,
                    )

                def stale(op):
                    lat, u_last, u_prev, t_last, t_prev, n_ref = op
                    pred, _ = plain_unet.apply(
                        params,
                        lat,
                        t,
                        cond_emb,
                        down_block_residuals=cn_c[0],
                        mid_block_residual=cn_c[1],
                    )
                    est = _extrapolate(
                        u_last, u_prev, t_last, t_prev, n_ref, t_f, extrap_w
                    )
                    return est, pred, u_last, u_prev, t_last, t_prev, n_ref

                (
                    uncond_pred, cond_pred,
                    u_last, u_prev, t_last, t_prev, n_ref,
                ) = jax.lax.cond(
                    refresh, fresh, stale,
                    (lat, u_last, u_prev, t_last, t_prev, n_ref),
                )
                noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
                return (
                    noise_pred,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    noise_pred, np_last, t_f, tn_last, n_np + 1.0,
                )

            def skip_step(operand):
                (
                    lat,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                ) = operand
                est = _extrapolate(
                    np_last, np_prev, tn_last, tn_prev, n_np, t_f, step_w
                )
                return (
                    est,
                    u_last, u_prev, t_last, t_prev, n_ref,
                    np_last, np_prev, tn_last, tn_prev, n_np,
                )

            operand = (
                latents,
                u_last, u_prev, t_last, t_prev, n_ref,
                np_last, np_prev, tn_last, tn_prev, n_np,
            )
            if step_cache:
                res = jax.lax.cond(refresh_s, full_step, skip_step, operand)
            else:
                res = full_step(operand)
            (
                noise_pred,
                u_last, u_prev, t_last, t_prev, n_ref,
                np_last, np_prev, tn_last, tn_prev, n_np,
            ) = res
            new_latents = ddim_step(ddim, noise_pred, t, tp, latents)
            new_carry = (
                frame_constrain(new_latents),
                u_last, u_prev, t_last, t_prev, n_ref,
            )
            if step_cache:
                new_carry = new_carry + (
                    np_last, np_prev, tn_last, tn_prev, n_np,
                )
            return new_carry, jnp.zeros(())

        if smap_cfg_pair:
            return guided_step_smap_pair, vanilla_step_smap_pair, None, None
        return guided_step, vanilla_step, guided_step_approx, vanilla_step_approx

    def _guided_chunk(params, latents, uncond_emb, cond_emb, motion_rep,
                      cn_params, cn_cond, xs):
        guided_step, _, guided_approx, _ = _make_steps(
            params, uncond_emb, cond_emb, motion_rep, cn_params, cn_cond
        )
        if approx_guided:
            # approx mode: callers append the per-step (refresh_u,
            # refresh_g, extrap_w[, refresh_s, step_w]) columns to xs; the
            # caches are zero-initialized per dispatch and flags[0] is
            # always True, so chunks stay self-contained (--resume stays
            # well-defined)
            z = jnp.zeros((), jnp.float32)
            init = (
                latents,
                jnp.zeros_like(latents), jnp.zeros_like(latents),
                z, z, z,
                jnp.zeros_like(latents),
            )
            if step_cache:
                init = init + (
                    jnp.zeros_like(latents), jnp.zeros_like(latents),
                    z, z, z,
                )
            (latents, *_), _ = jax.lax.scan(guided_approx, init, xs)
        else:
            latents, _ = jax.lax.scan(guided_step, latents, xs)
        return latents

    def _vanilla_chunk(params, latents, uncond_emb, cond_emb, motion_rep,
                       cn_params, cn_cond, xs):
        _, vanilla_step, _, vanilla_approx = _make_steps(
            params, uncond_emb, cond_emb, motion_rep, cn_params, cn_cond
        )
        if approx_vanilla:
            z = jnp.zeros((), jnp.float32)
            init = (
                latents,
                jnp.zeros_like(latents), jnp.zeros_like(latents),
                z, z, z,
            )
            if step_cache:
                init = init + (
                    jnp.zeros_like(latents), jnp.zeros_like(latents),
                    z, z, z,
                )
            (latents, *_), _ = jax.lax.scan(vanilla_approx, init, xs)
        else:
            latents, _ = jax.lax.scan(vanilla_step, latents, xs)
        return latents

    if frame_shard_map is not None:
        _chunk_specs = (_P(), _vid, _emb, _emb, _rep, _P(), _cn_cond, _P())
        guided_chunk = _smap(_guided_chunk, _chunk_specs, _vid)
        vanilla_chunk = _smap(_vanilla_chunk, _chunk_specs, _vid)
    else:
        guided_chunk = jax.jit(_guided_chunk)
        vanilla_chunk = jax.jit(_vanilla_chunk)

    # The full schedule runs as a handful of chunked dispatches instead of
    # one monolithic 100-step scan: same math (the scan body is identical,
    # chunk boundaries just split the xs) and the compiled bodies are
    # reused across chunks.  Chunk boundaries cost real idle time through
    # the dispatch tunnel (~0.3 s each measured), so chunks are as long as
    # compile time tolerates.
    #
    # ``resume_path`` adds mid-run checkpointing the reference lacks
    # (SURVEY §5: "The sampling loop itself has no resume/checkpointing"):
    # after each chunk the latent state is written atomically, and a rerun
    # with the same path picks up at the first unfinished chunk — exact,
    # since chunk boundaries only split the scan xs.  A checkpoint from a
    # different schedule or chunking is detected and ignored.
    # ``on_chunk(steps_done, total_steps)`` is a host progress callback.
    def sample(params, init_latents, uncond_emb, cond_emb, motion_rep,
               cn_params=None, cn_cond=None, chunk_steps: int = 50,
               resume_path: Optional[str] = None, on_chunk=None,
               resume_tag: str = "", uncond_refresh: Optional[int] = None,
               guidance_refresh: Optional[int] = None,
               uncond_extrap_w: Optional[float] = None,
               step_refresh: Optional[int] = None,
               step_extrap_w: Optional[float] = None):
        _check_smap_cn_cond(cn_cond)
        # ``uncond_refresh`` / ``guidance_refresh`` / ``step_refresh``
        # override the build-time refresh intervals at dispatch time (the
        # flags are runtime scan inputs, so no recompile —
        # scripts/bench_approx.py sweeps the (K_u, K_g, K_s) grid through
        # one executable)
        k_refresh = uncond_interval if uncond_refresh is None else uncond_refresh
        g_refresh = (
            guidance_interval if guidance_refresh is None else guidance_refresh
        )
        s_refresh = step_interval if step_refresh is None else step_refresh
        if uncond_refresh is not None and uncond_interval == 1:
            raise ValueError(
                "uncond_refresh needs the approx executables: build "
                "make_sampling_fns(..., uncond_interval>1)"
            )
        if guidance_refresh is not None and guidance_interval == 1:
            raise ValueError(
                "guidance_refresh needs the approx executables: build "
                "make_sampling_fns(..., guidance_interval>1)"
            )
        if step_refresh is not None and step_interval == 1:
            raise ValueError(
                "step_refresh needs the approx executables: build "
                "make_sampling_fns(..., step_interval>1)"
            )
        if k_refresh < 1:
            raise ValueError(f"uncond_refresh must be >= 1, got {k_refresh}")
        if g_refresh < 1:
            raise ValueError(
                f"guidance_refresh must be >= 1, got {g_refresh}"
            )
        if s_refresh < 1:
            raise ValueError(f"step_refresh must be >= 1, got {s_refresh}")
        if uncond_extrap_w is not None and uncond_interval == 1:
            raise ValueError(
                "uncond_extrap_w needs the approx executables: build "
                "make_sampling_fns(..., uncond_interval>1)"
            )
        if step_extrap_w is not None and step_interval == 1:
            raise ValueError(
                "step_extrap_w needs the approx executables: build "
                "make_sampling_fns(..., step_interval>1)"
            )
        w_extrap = uncond_extrap if uncond_extrap_w is None else uncond_extrap_w
        w_step = step_extrap if step_extrap_w is None else step_extrap_w
        total = len(timesteps)
        fingerprint = np.asarray(timesteps, np.int32)
        steps_done = 0
        latents = init_latents  # init_noise_sigma == 1 for DDIM
        if resume_path and os.path.exists(resume_path):
            d = np.load(resume_path)
            if (
                int(d["chunk_steps"]) == chunk_steps
                and str(d["tag"]) == resume_tag
                and d["timesteps"].shape == fingerprint.shape
                and (d["timesteps"] == fingerprint).all()
                and tuple(d["latents"].shape) == tuple(init_latents.shape)
            ):
                steps_done = int(d["steps_done"])
                # keep the caller's layout (sweeps shard the batch axis)
                latents = jax.device_put(
                    jnp.asarray(d["latents"], dtype=init_latents.dtype),
                    init_latents.sharding,
                )

        phases = (
            ((ts_guided, tp_guided, ramps_guided), guided_chunk, True),
            ((ts_vanilla, tp_vanilla), vanilla_chunk, False),
        )
        offset = 0
        for arrays, chunk_fn, is_guided in phases:
            n, lo = len(arrays[0]), 0
            while lo < n:
                size = min(chunk_steps, n - lo)
                if offset + size > steps_done:  # not already checkpointed
                    xs = tuple(a[lo : lo + size] for a in arrays)
                    # finer-cache refreshes count executed (full) steps when
                    # the step cache is active — see _refresh_flags
                    ex = (
                        (np.arange(size) % s_refresh) == 0
                        if step_cache else None
                    )
                    if is_guided and approx_guided:
                        xs = xs + (
                            _refresh_flags(size, k_refresh, ex),
                            _refresh_flags(size, g_refresh, ex),
                            _const_col(size, w_extrap),
                        )
                        if step_cache:
                            xs = xs + (
                                _refresh_flags(size, s_refresh),
                                _const_col(size, w_step),
                            )
                    elif not is_guided and approx_vanilla:
                        # the guidance cache is a guided-phase concept; the
                        # vanilla phase caches the uncond forward and the
                        # whole step
                        xs = xs + (
                            _refresh_flags(size, k_refresh, ex),
                            _const_col(size, w_extrap),
                        )
                        if step_cache:
                            xs = xs + (
                                _refresh_flags(size, s_refresh),
                                _const_col(size, w_step),
                            )
                    latents = chunk_fn(
                        params, latents, uncond_emb, cond_emb, motion_rep,
                        cn_params, cn_cond, xs,
                    )
                    if resume_path:
                        # f32 on disk (npz has no bf16); cast back is exact.
                        # keep the .npz suffix: np.savez appends it otherwise
                        tmp = resume_path + ".tmp.npz"
                        np.savez(
                            tmp,
                            latents=np.asarray(latents, dtype=np.float32),
                            steps_done=offset + size,
                            timesteps=fingerprint,
                            chunk_steps=chunk_steps,
                            tag=resume_tag,
                        )
                        os.replace(tmp, resume_path)
                    if on_chunk is not None:
                        on_chunk(offset + size, total)
                lo += size
                offset += size
        if resume_path and os.path.exists(resume_path):
            os.remove(resume_path)
        return latents

    # plain AnimateDiff generation without motion guidance — the reference's
    # legacy ``AnimationPipeline.__call__`` (pipeline_animation.py:326-497):
    # standard diffusers "leading" DDIM spacing, every step a vanilla CFG
    # step, optional controlnet residuals.
    ts_plain = build_timesteps(
        infer_cfg.inference_steps,
        sched_cfg.num_train_timesteps,
        steps_offset=sched_cfg.steps_offset,
        spacing="leading",
    )
    tp_plain = prev_timesteps(ts_plain)
    ts_plain_j = jnp.asarray(ts_plain)
    tp_plain_j = jnp.asarray(tp_plain)

    def sample_plain(params, init_latents, uncond_emb, cond_emb,
                     cn_params=None, cn_cond=None, chunk_steps: int = 50):
        _check_smap_cn_cond(cn_cond)
        latents = init_latents
        no_rep: MotionRep = {}
        n = len(ts_plain_j)
        lo = 0
        while lo < n:
            size = min(chunk_steps, n - lo)
            xs = (ts_plain_j[lo : lo + size], tp_plain_j[lo : lo + size])
            if approx_vanilla:
                ex = (
                    (np.arange(size) % step_interval) == 0
                    if step_cache else None
                )
                xs = xs + (
                    _refresh_flags(size, uncond_interval, ex),
                    _const_col(size, uncond_extrap),
                )
                if step_cache:
                    xs = xs + (
                        _refresh_flags(size, step_interval),
                        _const_col(size, step_extrap),
                    )
            latents = vanilla_chunk(
                params, latents, uncond_emb, cond_emb, no_rep,
                cn_params, cn_cond, xs,
            )
            lo += size
        return latents

    # vanilla steps that also emit the guidance blocks' temporal-attention
    # probabilities — the reference's ``save_probs`` debug dump
    # (pipeline_animation.py:461-465,483-485; there the attention recorder
    # captures the batched CFG forward, so the prob maps cover both halves)
    def _vanilla_probs_chunk(params, latents, uncond_emb, cond_emb,
                             cn_params, cn_cond, xs):
        emb_pair = jnp.concatenate([uncond_emb, cond_emb], axis=0)
        cfg_scale = infer_cfg.cfg_scale

        def step(lat, s):
            t, tp = s
            b = lat.shape[0]
            lat2 = jnp.concatenate([lat, lat], axis=0)
            if controlnet_apply is not None and cn_cond is not None:
                down_res, mid_res = controlnet_apply(
                    cn_params, lat2, t, emb_pair, cn_cond
                )
            else:
                down_res, mid_res = None, None
            pred2, probs = guided_unet.apply(
                params,
                lat2,
                t,
                emb_pair,
                down_block_residuals=down_res,
                mid_block_residual=mid_res,
            )
            uncond_pred, cond_pred = pred2[:b], pred2[b:]
            noise_pred = cond_pred + cfg_scale * (cond_pred - uncond_pred)
            return ddim_step(ddim, noise_pred, t, tp, lat), probs

        return jax.lax.scan(step, latents, xs)

    if frame_shard_map is not None:
        # probs stack per scan step: (steps, B, S, heads, f_local, f_global)
        _probs_spec = _P(None, _data, None, None, "frames", None)
        vanilla_probs_chunk = _smap(
            _vanilla_probs_chunk,
            (_P(), _vid, _emb, _emb, _P(), _cn_cond, _P()),
            (_vid, _probs_spec),
        )
    else:
        vanilla_probs_chunk = jax.jit(_vanilla_probs_chunk)

    def sample_plain_probs(params, init_latents, uncond_emb, cond_emb,
                           cn_params=None, cn_cond=None, chunk_steps: int = 10):
        """``sample_plain`` that also returns per-step temporal-attention
        probability maps ``{module: (steps, ...f, f) float array}``.  Debug
        surface only: chunks stay short so the stacked prob maps (33 MB per
        module per step at 512²) never pile up on device — each chunk's maps
        are fetched to host before the next dispatch."""
        _check_smap_cn_cond(cn_cond)
        latents = init_latents
        collected = []
        n = len(ts_plain_j)
        lo = 0
        while lo < n:
            size = min(chunk_steps, n - lo)
            xs = (ts_plain_j[lo : lo + size], tp_plain_j[lo : lo + size])
            latents, probs = vanilla_probs_chunk(
                params, latents, uncond_emb, cond_emb, cn_params, cn_cond, xs
            )
            collected.append(
                {k: np.asarray(v, dtype=np.float32) for k, v in probs.items()}
            )
            lo += size
        all_probs = {
            k: np.concatenate([c[k] for c in collected], axis=0)
            for k in (collected[0] if collected else {})
        }
        return latents, all_probs

    return SamplingFns(
        extract=extract, sample=sample, sample_plain=sample_plain,
        sample_plain_probs=sample_plain_probs,
        timesteps=timesteps, ddim=ddim,
        guided_chunk=guided_chunk, vanilla_chunk=vanilla_chunk,
        phase_xs=(
            (ts_guided, tp_guided, ramps_guided),
            (ts_vanilla, tp_vanilla),
        ),
    )


class MotionClonePipeline:
    """Host-side orchestration: seeds, persistence, VAE/text integration.

    The compute path is entirely inside :func:`make_sampling_fns`; this class
    mirrors the user-facing surface of the reference's ``AnimationPipeline``
    plus bound functions (obtain_motion_representation / sample_video).
    """

    def __init__(
        self,
        unet_cfg: UNet3DConfig,
        sched_cfg: NoiseScheduleConfig,
        infer_cfg: InferenceConfig,
        params: Mapping[str, Any],
        *,
        vae=None,
        text_encoder=None,
        dtype: jnp.dtype = jnp.bfloat16,
        attention_impl: str = "auto",
        controlnet_apply=None,
        cn_params=None,
        cfg_pair_sharding=None,
        frame_sharding=None,
        frame_shard_map=None,
        uncond_interval: int = 1,
        guidance_interval: int = 1,
        uncond_extrap: float = 0.0,
        step_interval: int = 1,
        step_extrap: float = 0.0,
    ):
        self.unet_cfg = unet_cfg
        self.sched_cfg = sched_cfg
        self.infer_cfg = infer_cfg
        self.params = params
        self.vae = vae
        self.text_encoder = text_encoder
        self.cn_params = cn_params
        self.controlnet_apply = controlnet_apply
        self.fns = make_sampling_fns(
            unet_cfg,
            sched_cfg,
            infer_cfg,
            dtype=dtype,
            attention_impl=attention_impl,
            controlnet_apply=controlnet_apply,
            cfg_pair_sharding=cfg_pair_sharding,
            frame_sharding=frame_sharding,
            frame_shard_map=frame_shard_map,
            uncond_interval=uncond_interval,
            guidance_interval=guidance_interval,
            uncond_extrap=uncond_extrap,
            step_interval=step_interval,
            step_extrap=step_extrap,
        )
        # latent placement: both frame-sharding flavors put the frame axis
        # of the (B, F, H, W, C) tensors on the mesh's ``frames`` axis
        if frame_sharding is None and frame_shard_map is not None:
            from motionclone_tpu.parallel.mesh import (
                frame_sharding as _frame_sharding,
            )

            frame_sharding = _frame_sharding(frame_shard_map)
        self.frame_sharding = frame_sharding
        self.dtype = dtype

    # -- latent-space API (VAE/text handled by caller or encode helpers) --

    def extract_motion_representation(
        self, video_latents: jnp.ndarray, uncond_emb: jnp.ndarray, seed: int,
        cn_cond=None,
    ) -> MotionRep:
        """One truncated forward -> sparse motion rep (reference :26-82)."""
        key = rng.seed_key(seed, rng.EXTRACT_NOISE)
        noise = jax.random.normal(key, video_latents.shape, dtype=jnp.float32)
        rep = self.fns.extract(
            self.params, video_latents, noise.astype(video_latents.dtype),
            uncond_emb, self.cn_params, cn_cond,
        )
        return jax.tree_util.tree_map(np.asarray, rep)

    def sample_latents(
        self,
        uncond_emb: jnp.ndarray,
        cond_emb: jnp.ndarray,
        motion_rep: MotionRep,
        seed: int,
        cn_cond=None,
        resume_path: Optional[str] = None,
        on_chunk=None,
    ) -> jnp.ndarray:
        """Guided DDIM sampling -> final latents (reference :102-171).

        ``resume_path``: optional mid-run checkpoint file — an interrupted
        run restarted with the same path continues at the first unfinished
        chunk (additive over the reference, SURVEY §5).
        """
        cfg = self.infer_cfg
        shape = (
            1,
            cfg.video_length,
            cfg.height // 8,
            cfg.width // 8,
            self.unet_cfg.in_channels,
        )
        key = rng.seed_key(seed, rng.INIT_LATENTS)
        latents = jax.random.normal(key, shape, dtype=jnp.float32).astype(self.dtype)
        if self.frame_sharding is not None:
            latents = jax.device_put(latents, self.frame_sharding)
        return self.fns.sample(
            self.params, latents, uncond_emb, cond_emb, motion_rep,
            self.cn_params, cn_cond,
            resume_path=resume_path, on_chunk=on_chunk,
        )

    def sample_latents_plain(
        self,
        uncond_emb: jnp.ndarray,
        cond_emb: jnp.ndarray,
        seed: int,
        cn_cond=None,
        save_probs_path: Optional[str] = None,
    ) -> jnp.ndarray:
        """Plain AnimateDiff generation, no motion guidance — parity with the
        reference's legacy ``AnimationPipeline.__call__``
        (pipeline_animation.py:326-497).

        ``save_probs_path``: the reference's ``save_probs`` debug hook
        (pipeline_animation.py:461-465,483-485) — writes every step's
        temporal-attention probability maps for the guidance blocks to an
        ``.npz`` (key per module, leading axis = step index) instead of the
        reference's pickle.
        """
        cfg = self.infer_cfg
        shape = (
            1,
            cfg.video_length,
            cfg.height // 8,
            cfg.width // 8,
            self.unet_cfg.in_channels,
        )
        key = rng.seed_key(seed, rng.INIT_LATENTS)
        latents = jax.random.normal(key, shape, dtype=jnp.float32).astype(self.dtype)
        if save_probs_path is not None:
            latents, probs = self.fns.sample_plain_probs(
                self.params, latents, uncond_emb, cond_emb, self.cn_params,
                cn_cond,
            )
            np.savez(save_probs_path, **probs)
            return latents
        return self.fns.sample_plain(
            self.params, latents, uncond_emb, cond_emb, self.cn_params, cn_cond
        )
