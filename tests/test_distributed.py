"""Multi-host sweep layer (parallel/distributed.py).

The partition math is unit-tested in-process; the distributed runtime
itself is exercised for real by spawning two CPU processes that join one
coordination service (the standard JAX multi-process idiom — SURVEY §4's
fake-backend approach extended to fake *hosts*), partition a shared example
list, and each run a jitted computation over a mesh of their local devices.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from motionclone_tpu.parallel.distributed import partition_examples

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))


def test_partition_examples_disjoint_cover_balanced():
    examples = [f"ex{i}" for i in range(7)]
    shards = [partition_examples(examples, pid, 3) for pid in range(3)]
    # disjoint and covering
    flat = [e for s in shards for e in s]
    assert sorted(flat) == sorted(examples)
    assert len(set(flat)) == len(examples)
    # balanced within one
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # stride order: process 0 gets 0,3,6
    assert shards[0] == ["ex0", "ex3", "ex6"]


def test_partition_examples_single_process_identity():
    examples = list(range(4))
    assert partition_examples(examples, 0, 1) == examples


def test_partition_examples_bad_rank():
    with pytest.raises(ValueError):
        partition_examples([1, 2], 2, 2)
    with pytest.raises(ValueError):
        partition_examples([1, 2], -1, 2)


CHILD = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    pid, port = int(sys.argv[1]), sys.argv[2]

    import jax
    # force the virtual CPU backend *via config*: env vars are too late in
    # this environment (sitecustomize imports jax at interpreter start)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)

    from motionclone_tpu.parallel.distributed import (
        initialize, partition_examples,
    )

    initialize(f"127.0.0.1:{{port}}", num_processes=2, process_id=pid)
    initialize()  # idempotent second call must be a no-op
    assert jax.process_count() == 2, jax.process_count()
    assert jax.process_index() == pid
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 4

    mine = partition_examples([f"ex{{i}}" for i in range(5)])

    # each process runs an independent jitted step over a mesh of its own
    # local devices — the share-nothing sweep pattern
    import jax.numpy as jnp
    from motionclone_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(devices=jax.local_devices())
    x = shard_batch(jnp.arange(8.0).reshape(2, 4), mesh)
    y = jax.jit(lambda a: a * 2)(x)
    assert float(y.sum()) == 56.0
    print(f"CHILD_OK pid={{pid}} mine={{','.join(mine)}}", flush=True)
    """
)


def test_two_process_distributed_sweep_partition(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD.format(repo=REPO))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(tmp_path),
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    shards = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("CHILD_OK")][0]
        pid = int(line.split("pid=")[1].split()[0])
        shards[pid] = line.split("mine=")[1].split(",")
    assert shards[0] == ["ex0", "ex2", "ex4"]
    assert shards[1] == ["ex1", "ex3"]
