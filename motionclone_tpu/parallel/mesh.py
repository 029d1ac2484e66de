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

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh_2axes(
    sizes: Tuple[int, int], names: Tuple[str, str], devices: Optional[Sequence]
) -> Mesh:
    """Validated 2-axis mesh over the first prod(sizes) devices."""
    a, b = sizes
    if a < 1 or b < 1:
        raise ValueError(
            f"{names[0]}={a} and {names[1]}={b} must be >= 1"
        )
    if devices is None:
        devices = jax.devices()
    n = a * b
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]).reshape(a, b), axis_names=names)


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
    return _mesh_2axes((data, cfg), ("data", "cfg"), devices)


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
    return _mesh_2axes((cfg, frames), ("cfg", "frames"), devices)


def make_mesh_sweep(
    data: int, cfg: int = 1, frames: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, cfg, frames) mesh for shard_map sweeps: independent examples
    over ``data``, each example's CFG pair over ``cfg`` (1 disables), and
    its frame axis over ``frames`` — the fully composed throughput x
    latency layout.  Frame shards of one example sit on adjacent devices so
    the temporal all_gathers ride single ICI hops; the cfg halves pair
    across the next stride."""
    if data < 1 or cfg < 1 or frames < 1:
        raise ValueError(
            f"data={data}, cfg={cfg}, frames={frames} must all be >= 1"
        )
    if devices is None:
        devices = jax.devices()
    n = data * cfg * frames
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(
        np.asarray(devices[:n]).reshape(data, cfg, frames),
        axis_names=("data", "cfg", "frames"),
    )


def make_mesh_data_frames(
    data: int, frames: int, devices: Optional[Sequence] = None
) -> Mesh:
    """A (data, frames) mesh: independent examples shard over ``data`` AND
    each example's frame axis shards over ``frames`` — the composed
    throughput x latency layout for sweeps on large slices."""
    return _mesh_2axes((data, frames), ("data", "frames"), devices)


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
