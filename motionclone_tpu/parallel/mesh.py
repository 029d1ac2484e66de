"""Device mesh + sharding for data-parallel sweeps.

The reference is strictly single-GPU (SURVEY §2.5); parallelism here is the
additive TPU-native design:

* ``data`` axis — independent JSONL examples (and/or the CFG pair) shard
  across chips; XLA inserts any needed collectives over ICI.
* model parameters are replicated (SD1.5 UNet fits comfortably per chip in
  bf16); no tensor/pipeline split is warranted at this model size.

Single-chip execution is the degenerate 1-device mesh, so there is exactly
one code path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """A 1-D ``data`` mesh over the first ``num_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        if num_devices > len(devices):
            raise ValueError(
                f"requested {num_devices} devices, have {len(devices)}"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def make_mesh_2d(
    data: int, cfg: int = 2, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, cfg) mesh: examples shard over ``data``, and the vanilla
    phase's classifier-free-guidance pair (uncond/cond UNet evaluations,
    reference motionclone_functions.py:248-253) splits over ``cfg`` —
    the two additive parallel axes of SURVEY §2.5.  Adjacent device pairs
    form the ``cfg`` groups so the pair's concat/split rides one ICI hop.
    """
    if devices is None:
        devices = jax.devices()
    n = data * cfg
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(data, cfg), axis_names=("data", "cfg")
    )


def make_mesh_video(
    frames: int, cfg: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """A (cfg, frames) mesh for **single-video latency scaling**.

    The reference is strictly single-GPU (SURVEY §2.5); this is the additive
    TPU-native axis that cuts per-video wall time instead of throughput:
    almost all UNet3D work — convolutions, GroupNorms, spatial
    self/cross-attention — is *per-frame independent* (frames fold into the
    batch, reference resnet.py:10-29, attention.py:99), so sharding the
    frame axis over ``frames`` devices parallelizes it perfectly; only the
    temporal motion modules (f=16 sequences per pixel) exchange data across
    chips, and XLA emits those collectives over ICI.  ``cfg=2`` additionally
    splits the classifier-free-guidance pair (uncond/cond UNet evaluations)
    across a second axis.
    """
    if frames < 1 or cfg < 1:
        raise ValueError(f"frames={frames} and cfg={cfg} must be >= 1")
    if devices is None:
        devices = jax.devices()
    n = cfg * frames
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(cfg, frames),
        axis_names=("cfg", "frames"),
    )


def make_mesh_data_frames(
    data: int, frames: int, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, frames) mesh: independent examples shard over ``data`` AND
    each example's frame axis shards over ``frames`` — the composed
    throughput x latency layout for sweeps on large slices."""
    if data < 1 or frames < 1:
        raise ValueError(f"data={data} and frames={frames} must be >= 1")
    if devices is None:
        devices = jax.devices()
    n = data * frames
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(data, frames),
        axis_names=("data", "frames"),
    )


def frame_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (B, F, H, W, C) video tensors: frame axis over
    ``frames``; the batch axis over ``data`` when the mesh has one
    (data x frames sweeps), else replicated within a cfg group."""
    batch = "data" if "data" in mesh.axis_names else None
    return NamedSharding(mesh, P(batch, "frames"))


def cfg_pair_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for ``[uncond-block, cond-block]`` batch-2B tensors: the
    leading axis splits cfg-major (the two halves) then data (examples).
    On a (cfg, frames) video mesh the leading axis splits over cfg only."""
    axes = ("cfg", "data") if "data" in mesh.axis_names else ("cfg",)
    return NamedSharding(mesh, P(axes))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch / example) axis over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params, mesh: Mesh):
    """Replicate a parameter pytree across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), params
    )


def shard_batch(tree, mesh: Mesh):
    """Place a pytree of batched arrays with the leading axis over ``data``."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
