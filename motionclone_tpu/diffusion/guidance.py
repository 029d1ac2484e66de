"""Sparse temporal-attention motion representation and guidance loss.

Functional rebuild of the reference's extraction/loss pair
(reference motionclone_functions.py:79 top-1 sparsification,
:85-100 gather-MSE loss, :228-234 warm-up/cool-down ramps).

A *motion representation* is a mapping from module name to a pair of arrays

    values:  f32  [..., frames, 1]   — the top-1 attention probability
    indices: uint8[..., frames, 1]   — its argmax position (frames <= 255)

over temporal-attention probability maps of shape ``[..., frames, frames]``.
The uint8 index storage preserves the reference's on-disk format
(motionclone_functions.py:79, SURVEY §8).
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax.numpy as jnp
import numpy as np


def sparsify_top1(probs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 (value, index) of each attention row: the motion representation.

    ``probs``: [..., f, f] temporal self-attention probabilities.
    Returns (values [..., f, 1] float32, indices [..., f, 1] uint8).
    """
    values = jnp.max(probs, axis=-1, keepdims=True).astype(jnp.float32)
    indices = jnp.argmax(probs, axis=-1, keepdims=True).astype(jnp.uint8)
    return values, indices


def gather_sparse_probs(probs: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Gather attention probabilities at saved argmax positions.

    ``probs``: [..., f, f]; ``indices``: integer [..., f, 1] (uint8 ok).
    Equivalent to ``torch.gather(probs, index, dim=-1)``
    (motionclone_functions.py:92).
    """
    return jnp.take_along_axis(probs, indices.astype(jnp.int32), axis=-1)


def motion_guidance_loss(
    current_probs: Mapping[str, jnp.ndarray],
    motion_representation: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]],
) -> jnp.ndarray:
    """Sum over modules of MSE(gathered current probs, saved max values).

    Matches ``compute_temp_loss`` (motionclone_functions.py:85-100): per-module
    mean squared error, summed across modules.  Computed in float32.

    The MSE is a per-example mean (axes 1..n) summed over the leading batch
    axis, so batching independent examples (data-parallel sweeps, SURVEY
    §2.5) yields exactly the reference's per-example gradients; for batch
    size 1 this is the reference's plain mean.
    """
    losses = []
    for name in sorted(current_probs.keys()):
        values, indices = motion_representation[name]
        picked = gather_sparse_probs(current_probs[name].astype(jnp.float32), indices)
        target = jnp.asarray(values, dtype=jnp.float32)
        sq = (picked - target) ** 2
        per_example = jnp.mean(sq.reshape(sq.shape[0], -1), axis=1)
        losses.append(jnp.sum(per_example))
    return jnp.sum(jnp.stack(losses))


def ramp_scales(
    guidance_steps: int, warm_up_steps: int, cool_up_steps: int
) -> np.ndarray:
    """Per-step loss multiplier for the guided phase (host-side, static).

    Reproduces motionclone_functions.py:228-234:
      * warm-up:   step < warm_up          -> (step+1)/warm_up
      * cool-down: step > guidance - cool  -> (guidance-step)/cool
    Both conditions are applied independently, exactly as the reference does.
    """
    scales = np.ones(guidance_steps, dtype=np.float32)
    for i in range(guidance_steps):
        if warm_up_steps > 0 and i < warm_up_steps:
            scales[i] *= (i + 1) / warm_up_steps
        if cool_up_steps > 0 and i > guidance_steps - cool_up_steps:
            scales[i] *= (guidance_steps - i) / cool_up_steps
    return scales


# ---------------------------------------------------------------------------
# Motion-representation persistence (.npz replaces the reference's .pt)
# ---------------------------------------------------------------------------


def save_motion_representation(
    path: str, rep: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]]
) -> None:
    """Persist {module: (values, indices)} to an .npz file.

    Module names keep the reference's dotted naming (e.g.
    ``up_blocks.1.motion_modules.0...``) so files are conceptually
    interchangeable with the reference's .pt payloads.
    """
    flat = {}
    for name, (values, indices) in rep.items():
        flat[f"{name}#values"] = np.asarray(values, dtype=np.float32)
        flat[f"{name}#indices"] = np.asarray(indices, dtype=np.uint8)
    np.savez(path, **flat)


def load_motion_representation(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    data = np.load(path)
    rep: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for key in data.files:
        if key.endswith("#values"):
            name = key[: -len("#values")]
            rep[name] = (data[key], data[f"{name}#indices"])
    return rep
