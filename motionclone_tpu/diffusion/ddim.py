"""Pure-functional DDIM math with score (motion) guidance.

Functional rebuild of the reference's monkey-patched scheduler methods
(reference motionclone_functions.py:286-472 ``schedule_customized_step`` /
``schedule_set_timesteps`` and the DDIM schedule constants of diffusers'
``DDIMScheduler`` configured by configs/model_config/model_config.yaml:16-20).

Everything here is either host-side schedule construction (numpy, static) or
a jit-safe pure function of arrays; there is no scheduler object state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from motionclone_tpu.config import NoiseScheduleConfig


class DDIMParams(NamedTuple):
    """Precomputed schedule constants, all float32 device arrays."""

    alphas_cumprod: jnp.ndarray  # [num_train_timesteps]
    final_alpha_cumprod: jnp.ndarray  # scalar
    num_train_timesteps: int
    prediction_type: str
    clip_sample: bool
    clip_sample_range: float
    thresholding: bool
    dynamic_thresholding_ratio: float
    sample_max_value: float


def make_betas(cfg: NoiseScheduleConfig) -> np.ndarray:
    """Noise schedule betas.

    The AnimateDiff/MotionClone schedule is ``linear`` with
    beta_start=0.00085, beta_end=0.012 (model_config.yaml:17-19) — note this
    is *not* SD1.5's ``scaled_linear``.
    """
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        return np.linspace(cfg.beta_start, cfg.beta_end, T, dtype=np.float64)
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(cfg.beta_start**0.5, cfg.beta_end**0.5, T, dtype=np.float64)
            ** 2
        )
    if cfg.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2

        ts = np.arange(T, dtype=np.float64)
        return np.minimum(1 - alpha_bar((ts + 1) / T) / alpha_bar(ts / T), 0.999)
    raise ValueError(f"unknown beta_schedule: {cfg.beta_schedule}")


def make_ddim_params(cfg: NoiseScheduleConfig) -> DDIMParams:
    betas = make_betas(cfg)
    alphas_cumprod = np.cumprod(1.0 - betas)
    final = 1.0 if cfg.set_alpha_to_one else float(alphas_cumprod[0])
    return DDIMParams(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=jnp.float32),
        final_alpha_cumprod=jnp.asarray(final, dtype=jnp.float32),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
        clip_sample=cfg.clip_sample,
        clip_sample_range=cfg.clip_sample_range,
        thresholding=cfg.thresholding,
        dynamic_thresholding_ratio=cfg.dynamic_thresholding_ratio,
        sample_max_value=cfg.sample_max_value,
    )


# ---------------------------------------------------------------------------
# Timestep schedules (host-side, static)
# ---------------------------------------------------------------------------


def build_timesteps(
    num_inference_steps: int,
    num_train_timesteps: int = 1000,
    guidance_steps: int = 0,
    guidance_fraction: float = 0.0,
    steps_offset: int = 1,
    spacing: str = "uneven",
) -> np.ndarray:
    """Descending int64 timestep sequence.

    ``uneven`` reproduces the reference's guidance-weighted schedule
    (motionclone_functions.py:432-445): ``guidance_steps`` timesteps linspaced
    over the top ``guidance_fraction`` of the train range, then the remainder
    linspaced over the bottom, concatenated descending.  ``linspace`` /
    ``leading`` / ``trailing`` follow motionclone_functions.py:448-466.
    """
    if num_inference_steps > num_train_timesteps:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) > num_train_timesteps "
            f"({num_train_timesteps})"
        )
    if spacing == "uneven":
        split = int((1 - guidance_fraction) * num_train_timesteps)
        ts_guidance = (
            np.linspace(split, num_train_timesteps - 1, guidance_steps)
            .round()[::-1]
            .astype(np.int64)
        )
        ts_vanilla = (
            np.linspace(0, split - 1, num_inference_steps - guidance_steps)
            .round()[::-1]
            .astype(np.int64)
        )
        return np.concatenate([ts_guidance, ts_vanilla])
    if spacing == "linspace":
        return (
            np.linspace(0, num_train_timesteps - 1, num_inference_steps)
            .round()[::-1]
            .astype(np.int64)
        )
    if spacing == "leading":
        step_ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        return ts.astype(np.int64) + steps_offset
    if spacing == "trailing":
        step_ratio = num_train_timesteps / num_inference_steps
        return np.round(np.arange(num_train_timesteps, 0, -step_ratio)).astype(np.int64) - 1
    raise ValueError(f"unknown spacing: {spacing}")


def prev_timesteps(timesteps: np.ndarray) -> np.ndarray:
    """Previous timestep per position, read from the *list* (not a fixed
    stride), with -1 after the last entry (motionclone_functions.py:326-329)."""
    return np.concatenate([timesteps[1:], np.array([-1], dtype=timesteps.dtype)])


# ---------------------------------------------------------------------------
# Pure step math (jit-safe)
# ---------------------------------------------------------------------------


def add_noise(
    params: DDIMParams, timestep, x0: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """x_t = sqrt(a_t) x0 + sqrt(1-a_t) eps (motionclone_functions.py:19-23).

    Schedule math in float32 regardless of the activation dtype (the
    module convention, as ddim_step); only the result is cast back.
    """
    a = params.alphas_cumprod[timestep].astype(jnp.float32)
    x = a**0.5 * x0.astype(jnp.float32) + (1.0 - a) ** 0.5 * noise.astype(
        jnp.float32
    )
    return x.astype(x0.dtype)


def threshold_sample(
    sample: jnp.ndarray, ratio: float, max_value: float
) -> jnp.ndarray:
    """Dynamic thresholding of predicted x0 (Imagen, arXiv:2205.11487 §2.4).

    Matches diffusers' ``DDIMScheduler._threshold_sample`` as invoked by the
    reference's step (motionclone_functions.py:355-357): per *batch sample*,
    s = quantile(|x0|, ratio) over every non-batch element (linear
    interpolation, torch.quantile's default), clamped to
    ``[1, sample_max_value]``, then x0 <- clip(x0, -s, s) / s.  Computed in
    float32 like the rest of the step math.  (The reference's diffusers 0.16
    copy unpacks a 4-D NCHW shape and would crash on 5-D video latents —
    since no shipped config enables thresholding that path is dead there; we
    generalize to any rank with the same per-sample semantics.)
    """
    dtype = sample.dtype
    x = sample.astype(jnp.float32).reshape(sample.shape[0], -1)
    s = jnp.quantile(jnp.abs(x), ratio, axis=1, method="linear")
    s = jnp.clip(s, 1.0, max_value)[:, None]
    x = jnp.clip(x, -s, s) / s
    return x.reshape(sample.shape).astype(dtype)


def _alpha_at(params: DDIMParams, t) -> jnp.ndarray:
    """alphas_cumprod[t] with t == -1 mapping to final_alpha_cumprod."""
    t = jnp.asarray(t)
    safe_t = jnp.maximum(t, 0)
    return jnp.where(t >= 0, params.alphas_cumprod[safe_t], params.final_alpha_cumprod)


def ddim_variance(params: DDIMParams, timestep, prev_timestep) -> jnp.ndarray:
    """sigma_t^2 = (1-a_prev)/(1-a_t) * (1 - a_t/a_prev)."""
    a_t = _alpha_at(params, timestep)
    a_prev = _alpha_at(params, prev_timestep)
    return (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)


def ddim_step(
    params: DDIMParams,
    model_output: jnp.ndarray,
    timestep,
    prev_timestep,
    sample: jnp.ndarray,
    *,
    eta: float = 0.0,
    score: Optional[jnp.ndarray] = None,
    guidance_scale: float = 1.0,
    variance_noise: Optional[jnp.ndarray] = None,
    use_clipped_model_output: bool = False,
) -> jnp.ndarray:
    """One (optionally guided) DDIM update.

    Faithful to the reference's ``schedule_customized_step``
    (motionclone_functions.py:286-409): guidance is injected on
    ``pred_epsilon`` as ``eps <- eps - guidance_scale * sqrt(1-a_t) * score``
    (:375-382) *after* x0-prediction, so pred_original_sample is unguided.

    All math runs in float32 regardless of the model compute dtype; the
    result is cast back to ``sample.dtype``.
    """
    out_dtype = sample.dtype
    sample = sample.astype(jnp.float32)
    model_output = model_output.astype(jnp.float32)

    a_t = _alpha_at(params, timestep)
    a_prev = _alpha_at(params, prev_timestep)
    beta_t = 1.0 - a_t

    if params.prediction_type == "epsilon":
        pred_x0 = (sample - beta_t**0.5 * model_output) / a_t**0.5
        pred_eps = model_output
    elif params.prediction_type == "sample":
        pred_x0 = model_output
        pred_eps = (sample - a_t**0.5 * pred_x0) / beta_t**0.5
    elif params.prediction_type == "v_prediction":
        pred_x0 = a_t**0.5 * sample - beta_t**0.5 * model_output
        pred_eps = a_t**0.5 * model_output + beta_t**0.5 * sample
    else:
        raise ValueError(f"unknown prediction_type: {params.prediction_type}")

    # reference order (motionclone_functions.py:355-360): thresholding takes
    # precedence over clip_sample
    if params.thresholding:
        pred_x0 = threshold_sample(
            pred_x0, params.dynamic_thresholding_ratio, params.sample_max_value
        )
    elif params.clip_sample:
        pred_x0 = jnp.clip(pred_x0, -params.clip_sample_range, params.clip_sample_range)

    variance = ddim_variance(params, timestep, prev_timestep)
    std_dev_t = eta * variance**0.5

    if use_clipped_model_output:
        pred_eps = (sample - a_t**0.5 * pred_x0) / beta_t**0.5

    if score is not None:
        # classifier-style guidance, formula (14) of arXiv:2105.05233
        pred_eps = pred_eps - guidance_scale * (1.0 - a_t) ** 0.5 * score.astype(
            jnp.float32
        )

    pred_dir = (1.0 - a_prev - std_dev_t**2) ** 0.5 * pred_eps
    prev_sample = a_prev**0.5 * pred_x0 + pred_dir

    if eta > 0:
        if variance_noise is None:
            raise ValueError("eta > 0 requires variance_noise")
        prev_sample = prev_sample + std_dev_t * variance_noise.astype(jnp.float32)

    return prev_sample.astype(out_dtype)
