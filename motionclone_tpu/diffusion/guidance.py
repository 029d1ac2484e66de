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

import json
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
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
    axis_name: Optional[str] = None,
) -> jnp.ndarray:
    """Sum over modules of MSE(gathered current probs, saved max values).

    Matches ``compute_temp_loss`` (motionclone_functions.py:85-100): per-module
    mean squared error, summed across modules.  Computed in float32.

    The MSE is a per-example mean (axes 1..n) summed over the leading batch
    axis, so batching independent examples (data-parallel sweeps, SURVEY
    §2.5) yields exactly the reference's per-example gradients; for batch
    size 1 this is the reference's plain mean.

    ``axis_name``: inside ``shard_map`` with the query-frame axis sharded
    (sequence parallelism over frames), probs/values/indices hold only the
    local frames — pass the mesh axis name and each shard returns its
    *partial* of the global-mean MSE (local sum over the global element
    count; the shards' values sum to the reference loss).  No psum is
    taken: differentiating the local partial is exactly right, because the
    cross-shard terms (this shard's K/V feeding other shards' losses)
    arrive through the ``all_gather`` transpose, which reduce-scatters the
    cotangents across shards — and an explicit psum of the value would be
    double-counted by the transpose under ``check_vma=False``.  Contract:
    this formulation is written for ``jax.shard_map(..., check_vma=False)``
    (the regime the pipeline uses, forced by the Pallas kernels inside);
    callers wanting the *value* of the global loss must psum the result
    themselves outside the differentiated function.
    """
    losses = []
    for name in sorted(current_probs.keys()):
        values, indices = motion_representation[name]
        picked = gather_sparse_probs(current_probs[name].astype(jnp.float32), indices)
        target = jnp.asarray(values, dtype=jnp.float32)
        sq = (picked - target) ** 2
        per_example_sum = jnp.sum(sq.reshape(sq.shape[0], -1), axis=1)
        numel = int(np.prod(sq.shape[1:]))
        if axis_name is not None:
            numel *= jax.lax.axis_size(axis_name)
        losses.append(jnp.sum(per_example_sum / numel))
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
    path: str,
    rep: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]],
    meta: Optional[Mapping[str, Any]] = None,
) -> None:
    """Persist {module: (values, indices)} to an .npz file — or, when
    ``path`` ends in ``.pt``/``.pth``, to the reference's torch payload
    (so representations extracted here can be consumed by the CUDA
    reference, see ``_save_motion_representation_torch``).

    ``meta``: optional JSON-able dict recording the settings the rep was
    extracted under (resolution, video_length, guidance blocks, seed) —
    used by the runner's disk cache to invalidate stale entries.  Only
    supported in the .npz format; the reference's .pt carries none.

    Module names keep the reference's dotted naming (e.g.
    ``up_blocks.1.motion_modules.0...``) so files are interchangeable
    with the reference's .pt payloads.
    """
    if path.endswith((".pt", ".pth")):
        _save_motion_representation_torch(path, rep)
        return
    flat = {}
    for name, (values, indices) in rep.items():
        flat[f"{name}#values"] = np.asarray(values, dtype=np.float32)
        flat[f"{name}#indices"] = np.asarray(indices, dtype=np.uint8)
    if meta is not None:
        flat["#meta"] = np.asarray(json.dumps(dict(meta), sort_keys=True))
    np.savez(path, **flat)


def load_motion_representation(path: str) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    """Load a motion representation: native ``.npz`` or a reference ``.pt``.

    ``.pt``/``.pth`` paths are parsed as the reference's torch payload
    (motionclone_functions.py:79-81), so representations extracted with the
    CUDA reference are drop-in usable here.
    """
    if path.endswith((".pt", ".pth")):
        return _load_motion_representation_torch(path)
    data = np.load(path)
    rep: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for key in data.files:
        if key.endswith("#values"):
            name = key[: -len("#values")]
            rep[name] = (data[key], data[f"{name}#indices"])
    return rep


def load_motion_representation_meta(path: str) -> Optional[Dict[str, Any]]:
    """The ``meta`` dict a .npz representation was saved with, or None
    (reference .pt payloads and pre-meta files carry none)."""
    if path.endswith((".pt", ".pth")):
        return None
    data = np.load(path)
    if "#meta" not in data.files:
        return None
    return json.loads(str(data["#meta"]))


# ---------------------------------------------------------------------------
# Reference .pt interop (torch is host-side/optional; TPU compute never
# touches it)
# ---------------------------------------------------------------------------
#
# The reference persists ``{module_name: [max_value, max_index.uint8]}``
# via torch.save, with per-module arrays shaped ``(b*s, heads, f, 1)``
# (motionclone_functions.py:79-81: probs are reshaped to
# ``(-1, heads, f, f)`` at :281 before top-1).  Our in-memory layout keeps
# the batch and pixel axes separate: ``(b, s, heads, f, 1)``.  Batch size is
# 1 in every reference flow (motionclone_functions.py:133), so the mapping
# between the two is a pure reshape.


def _load_motion_representation_torch(
    path: str, batch: int = 1
) -> Dict[str, Tuple[np.ndarray, np.ndarray]]:
    import torch  # host-side only

    payload = torch.load(path, map_location="cpu", weights_only=True)
    rep: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
    for name, pair in payload.items():
        values, indices = pair[0], pair[1]
        v = np.asarray(values.to(torch.float32).numpy())
        i = np.asarray(indices.numpy()).astype(np.uint8)
        if v.ndim != 4 or v.shape[-1] != 1 or v.shape[0] % batch:
            raise ValueError(
                f"{path}: module {name!r} has shape {v.shape}; expected the "
                f"reference layout (batch*pixels, heads, frames, 1) with "
                f"batch={batch}"
            )
        shape = (batch, v.shape[0] // batch) + v.shape[1:]
        rep[name] = (v.reshape(shape), i.reshape(shape))
    return rep


def _save_motion_representation_torch(
    path: str, rep: Mapping[str, Tuple[jnp.ndarray, jnp.ndarray]]
) -> None:
    import torch  # host-side only

    payload = {}
    for name, (values, indices) in rep.items():
        # np.array (not asarray): jax buffers are non-writable views, and
        # torch.from_numpy requires writable memory
        v = np.array(values, dtype=np.float32)
        i = np.array(indices, dtype=np.uint8)
        # (b, s, heads, f, 1) -> the reference's (b*s, heads, f, 1)
        v = v.reshape((-1,) + v.shape[2:])
        i = i.reshape((-1,) + i.shape[2:])
        payload[name] = [torch.from_numpy(v), torch.from_numpy(i)]
    torch.save(payload, path)
