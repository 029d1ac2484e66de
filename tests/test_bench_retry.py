"""bench.py backend acquisition: retry across the wedged-axon window.

The r03/r04 driver artifacts were both nulled by artifact-capture
failures; r04's was a single ``Unable to initialize backend 'axon':
UNAVAILABLE`` raised straight through at first device touch — a transient
CLAUDE.md documents as clearing in ~3-5 minutes.  ``acquire_devices``
must (a) retry through a transient failure and stage the retry count,
(b) reject a silent CPU fallback (garbage headline otherwise), and
(c) when the backend never recovers, emit a diagnosable staged artifact
(``backend_unavailable`` + error tail) and exit nonzero — never a bare
traceback with a null JSON line.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bench's import installs SIGTERM/SIGINT handlers that os._exit — inside
# pytest those would swallow Ctrl-C / harness TERMs for the whole session,
# so capture and restore the previous handlers around the import
_prev_int = signal.getsignal(signal.SIGINT)
_prev_term = signal.getsignal(signal.SIGTERM)
import bench  # noqa: E402

signal.signal(signal.SIGINT, _prev_int)
signal.signal(signal.SIGTERM, _prev_term)

# disarm bench's atexit JSON emission — this is pytest, not a bench run
bench._emitted = True


class _Dev:
    def __init__(self, platform):
        self.platform = platform

    def __repr__(self):
        return f"_Dev({self.platform})"


def _window(monkeypatch, budget, elapsed):
    """Shape the retry window: deadline = START + min(480, 0.6*budget),
    with ``elapsed`` seconds already burned (keeps test sleeps short)."""
    monkeypatch.setattr(bench, "BUDGET_S", budget)
    monkeypatch.setattr(bench, "START", time.time() - elapsed)


def test_recovers_after_transient_failure(monkeypatch):
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError(
                "Unable to initialize backend 'axon': UNAVAILABLE"
            )
        return [_Dev("tpu")]

    monkeypatch.setattr(bench.jax, "devices", flaky)
    # left ~60 s at start: two capped (0.1 s) sleeps always fit, even on a
    # badly loaded machine — a too-tight window here would trip the
    # exhaustion path, whose os._exit(1) kills the whole pytest process
    _window(monkeypatch, budget=700.0, elapsed=360.0)
    real_sleep = time.sleep
    monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(min(s, 0.1)))
    staged = {}
    monkeypatch.setattr(bench, "stage", lambda **kv: staged.update(kv))
    devs = bench.acquire_devices()
    assert devs[0].platform == "tpu"
    assert calls["n"] == 3
    assert staged == {"backend_retries": 2}


def test_cpu_fallback_rejected_then_tpu(monkeypatch):
    """jax falling back to CPU without the TPU plugin must count as a
    failure (timing the workload there would stage a garbage headline)."""
    calls = {"n": 0}

    def cpu_then_tpu():
        calls["n"] += 1
        return [_Dev("cpu" if calls["n"] == 1 else "tpu")]

    monkeypatch.setattr(bench.jax, "devices", cpu_then_tpu)
    _window(monkeypatch, budget=700.0, elapsed=360.0)
    real_sleep = time.sleep
    monkeypatch.setattr(bench.time, "sleep", lambda s: real_sleep(min(s, 0.1)))
    monkeypatch.setattr(bench, "stage", lambda **kv: None)
    devs = bench.acquire_devices()
    assert devs[0].platform == "tpu"
    assert calls["n"] == 2


@pytest.mark.parametrize("smoke", [True])
def test_exhaustion_emits_diagnosable_artifact(smoke, tmp_path):
    """Deadline exhaustion path in a subprocess (it os._exit(1)s): the
    LAST stdout line must be valid JSON carrying backend_unavailable and
    the error tail — the driver parses exactly that."""
    script = tmp_path / "exhaust.py"
    script.write_text(
        "import sys, time\n"
        "sys.argv.append('--smoke')\n"  # pins jax to CPU at import
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "import bench, jax\n"
        "def dead():\n"
        "    raise RuntimeError(\"Unable to initialize backend 'axon': "
        "UNAVAILABLE\")\n"
        "jax.devices = dead\n"
        "bench.SMOKE = False\n"  # exercise the real (non-smoke) guard path
        "bench.BUDGET_S = 5.0\n"
        "bench.START = time.time()\n"
        "bench.acquire_devices()\n"
        "print('NOT REACHED')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=300, env=env,
    )
    assert proc.returncode == 1, proc.stderr[-2000:]
    assert "NOT REACHED" not in proc.stdout
    last = proc.stdout.strip().splitlines()[-1]
    artifact = json.loads(last)
    assert artifact["backend_unavailable"] is True
    assert "UNAVAILABLE" in artifact["backend_error"]
    assert artifact["value"] is None
    assert artifact["backend_attempts"] >= 1
