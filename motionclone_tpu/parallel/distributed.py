"""Multi-host (multi-process) sweep support.

The reference is strictly single-process / single-GPU (SURVEY §2.5:
``device = "cuda"`` at reference t2v_video_sample.py:20, examples processed
serially at :75-105).  On a multi-host TPU pod the examples of a sweep are
embarrassingly parallel — independent seeds, prompts, and reference videos —
so the TPU-native multi-host design is **share-nothing**: initialize the JAX
distributed runtime (so every process agrees on the global topology and
barriers), stride-partition the JSONL across processes, and let each host
sweep its own local chips.  No DCN collectives are issued at all; scaling is
perfect by construction and a straggler host only delays its own shard.

Intra-host parallelism (data/cfg/frames meshes over the local chips) is
unchanged — :func:`motionclone_tpu.pipeline.sweep.run_sweep` composes with
this layer by running on ``jax.local_devices()``.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, TypeVar

import jax

T = TypeVar("T")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the JAX distributed runtime (idempotent).

    With no arguments, relies on cluster auto-detection (TPU pod metadata,
    or the ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` environment variables, which take effect inside
    ``jax.distributed.initialize``).  Must run before the first backend
    touch; note that plain ``JAX_PLATFORMS`` env vars are too late in this
    environment (sitecustomize imports jax at interpreter start) — force a
    platform with ``jax.config.update("jax_platforms", ...)`` instead.
    """
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return
    # CPU backends need a collectives transport to come up multi-process
    # (jax >= 0.9 defaults to gloo; repair an explicit 'none').  Checked via
    # the config value — querying jax.default_backend() here would
    # initialize the backend before the distributed client exists.
    if jax.config.jax_cpu_collectives_implementation in (None, "none"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            local_device_ids=local_device_ids,
        )
    except ValueError as e:
        if "coordinator_address" in str(e):
            raise ValueError(
                "distributed run requested but no cluster was auto-detected "
                "(not on a TPU pod?); pass --coordinator HOST:PORT "
                "--num-processes N --process-id I on every host, or set "
                "JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID"
            ) from e
        raise


def partition_examples(
    examples: Sequence[T],
    process_id: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[T]:
    """This process's share of a sweep: ``examples[pid::count]``.

    A stride (round-robin) split keeps per-host batch counts within one of
    each other for any example count, and — because JSONL files tend to
    group related workloads (SURVEY §2.1: 12 camera + 6 object examples) —
    spreads any per-group cost skew across hosts instead of handing one
    host the whole expensive group.
    """
    pid = jax.process_index() if process_id is None else process_id
    count = jax.process_count() if process_count is None else process_count
    if not 0 <= pid < count:
        raise ValueError(f"process_id {pid} out of range for {count} processes")
    return list(examples[pid::count])


def maybe_initialize_from_args(args) -> bool:
    """CLI glue: join the distributed runtime if multi-process flags/env ask
    for it.  Returns True when running multi-process (so the caller should
    partition examples and sweep local devices only)."""
    explicit = bool(
        getattr(args, "coordinator", None)
        or getattr(args, "num_processes", 0) > 1
    )
    env = bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if not (explicit or env or getattr(args, "distributed", False)):
        return False
    kwargs = {}
    if getattr(args, "coordinator", None):
        kwargs["coordinator_address"] = args.coordinator
    if getattr(args, "num_processes", 0) > 1:
        kwargs["num_processes"] = args.num_processes
    if getattr(args, "process_id", -1) >= 0:
        kwargs["process_id"] = args.process_id
    initialize(**kwargs)
    return jax.process_count() > 1
