"""Serving layer: HTTP job server around a warm runtime (serve.py).

Uses an injected fake run_job (the real one is a MotionCloneRuntime closure,
cli.serve_main) — the serving machinery (queueing, serial execution, failure
isolation, validation, metrics) is what's under test; no checkpoints needed.
"""

import json
import threading
import time
import urllib.error
import urllib.request

import pytest

from motionclone_tpu.serve import MotionCloneServer, _validate_example


def _req(port, path, payload=None):
    url = f"http://127.0.0.1:{port}{path}"
    if payload is None:
        req = urllib.request.Request(url)
    else:
        req = urllib.request.Request(
            url, data=json.dumps(payload).encode(), method="POST"
        )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, r.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def _wait_status(port, job_id, want, timeout=10.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        _, body = _req(port, f"/jobs/{job_id}")
        rec = json.loads(body)
        if rec["status"] == want:
            return rec
        time.sleep(0.02)
    raise AssertionError(f"job {job_id} never reached {want}: {rec}")


@pytest.fixture()
def server(tmp_path):
    calls = []

    def run_job(example):
        calls.append(example["new_prompt"])
        if example["new_prompt"] == "boom":
            raise RuntimeError("synthetic job failure")
        out = tmp_path / f"{len(calls)}.mp4"
        out.write_bytes(b"")
        return str(out)

    srv = MotionCloneServer(run_job, port=0, max_queue=4)
    srv.calls = calls
    srv.start()
    yield srv
    srv.shutdown()


def test_generate_roundtrip(server):
    code, body = _req(
        server.port, "/generate",
        {"video_path": "v.mp4", "new_prompt": "a cat", "seed": 3},
    )
    assert code == 202
    job_id = json.loads(body)["job_id"]
    rec = _wait_status(server.port, job_id, "done")
    assert rec["output_path"].endswith(".mp4")
    assert rec["seconds"] >= 0
    assert server.calls == ["a cat"]


def test_jobs_run_in_submission_order_and_failures_isolate(server):
    ids = []
    for prompt in ("one", "boom", "two"):
        code, body = _req(
            server.port, "/generate", {"video_path": "v.mp4", "new_prompt": prompt}
        )
        assert code == 202
        ids.append(json.loads(body)["job_id"])
    done0 = _wait_status(server.port, ids[0], "done")
    failed = _wait_status(server.port, ids[1], "failed")
    done2 = _wait_status(server.port, ids[2], "done")
    assert "synthetic job failure" in failed["error"]
    assert done0["finished_at"] <= done2["started_at"]  # FIFO, serial
    assert server.calls == ["one", "boom", "two"]
    # /jobs lists all three in submission order
    _, body = _req(server.port, "/jobs")
    assert [j["job_id"] for j in json.loads(body)["jobs"]] == ids


def test_concurrent_clients_under_load(tmp_path):
    """Client storm against the ThreadingHTTPServer: several threads
    submitting and polling concurrently while others hammer /jobs,
    /health and /metrics.  Every accepted job must complete exactly once
    with a coherent terminal record (the store's lock discipline), and
    the counters must add up."""
    lock = threading.Lock()
    calls = []

    def run_job(example):
        with lock:
            calls.append(example["new_prompt"])
        time.sleep(0.002)
        out = tmp_path / f"{len(calls)}.mp4"
        out.write_bytes(b"")
        return str(out)

    srv = MotionCloneServer(run_job, port=0, max_queue=64)
    srv.start()
    try:
        n_threads, per_thread = 6, 5
        accepted = [[] for _ in range(n_threads)]
        errors = []

        def submitter(i):
            try:
                for j in range(per_thread):
                    code, body = _req(
                        srv.port, "/generate",
                        {"video_path": "v.mp4", "new_prompt": f"p{i}-{j}"},
                    )
                    assert code == 202, body
                    accepted[i].append(json.loads(body)["job_id"])
                    # interleave reads with writes
                    _req(srv.port, "/jobs")
                    _req(srv.port, "/health")
            except Exception as e:  # surfaced below
                errors.append(e)

        def reader():
            try:
                for _ in range(20):
                    code, _ = _req(srv.port, "/metrics")
                    assert code == 200
                    time.sleep(0.005)
            except Exception as e:
                errors.append(e)

        threads = [
            threading.Thread(target=submitter, args=(i,))
            for i in range(n_threads)
        ] + [threading.Thread(target=reader) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors

        all_ids = [jid for ids in accepted for jid in ids]
        assert len(all_ids) == len(set(all_ids)) == n_threads * per_thread
        for jid in all_ids:
            rec = _wait_status(srv.port, jid, "done", timeout=30)
            # terminal record is complete (status flips under the lock)
            assert rec["finished_at"] is not None
            assert rec["seconds"] >= 0
            assert rec["output_path"].endswith(".mp4")
        # each job ran exactly once
        assert sorted(calls) == sorted(
            f"p{i}-{j}" for i in range(n_threads) for j in range(per_thread)
        )
    finally:
        srv.shutdown()


def test_validation_errors():
    # no server needed for the pure validator
    with pytest.raises(ValueError, match="required field"):
        _validate_example({"new_prompt": "x"})
    with pytest.raises(ValueError, match="unknown example fields"):
        _validate_example({"video_path": "v", "new_prompt": "x", "nope": 1})
    with pytest.raises(ValueError, match="JSON object"):
        _validate_example([1, 2])


def test_http_error_paths(server):
    code, body = _req(server.port, "/generate", {"new_prompt": "x"})
    assert code == 400 and "video_path" in body
    code, _ = _req(server.port, "/jobs/deadbeef")
    assert code == 404
    code, _ = _req(server.port, "/nope")
    assert code == 404


def test_health_and_metrics(server):
    code, body = _req(server.port, "/health")
    assert code == 200
    health = json.loads(body)
    assert health["status"] == "ok" and health["worker_alive"]
    _req(server.port, "/generate", {"video_path": "v.mp4", "new_prompt": "m"})
    deadline = time.time() + 10
    while time.time() < deadline:
        _, text = _req(server.port, "/metrics")
        if "motionclone_jobs_done 1" in text:
            break
        time.sleep(0.02)
    assert "motionclone_jobs_total 1" in text
    assert "motionclone_generate_seconds_count 1" in text


def test_queue_backpressure(tmp_path):
    release = threading.Event()

    def run_job(example):
        release.wait(timeout=30)
        return str(tmp_path / "out.mp4")

    srv = MotionCloneServer(run_job, port=0, max_queue=2)
    srv.start()
    try:
        codes = [
            _req(srv.port, "/generate",
                 {"video_path": "v.mp4", "new_prompt": f"p{i}"})[0]
            for i in range(4)
        ]
        # 1 running + 2 queued fit; at least one later submit is rejected
        assert codes[0] == 202 and 503 in codes
        # the rejected submit must not leave a phantom job record
        _, body = _req(srv.port, "/jobs")
        assert all(j["status"] != "failed" for j in json.loads(body)["jobs"])
        assert len(json.loads(body)["jobs"]) == codes.count(202)
    finally:
        release.set()
        srv.shutdown()


def test_batch_drain_runs_queued_jobs_together(tmp_path):
    """Deterministic batch test: jobs queued before the worker starts must
    drain as one batch through run_jobs_batch (the multi-chip sweep path)."""
    from motionclone_tpu.serve import JobStore, _worker_loop

    store = JobStore(max_queue=8)
    jobs = [
        store.submit({"video_path": "v.mp4", "new_prompt": f"p{i}"})
        for i in range(3)
    ]
    batches = []

    def run_jobs_batch(examples):
        batches.append([e["new_prompt"] for e in examples])
        return [str(tmp_path / f"{e['new_prompt']}.mp4") for e in examples]

    def run_job(example):
        raise AssertionError("single-job path must not run for a full queue")

    store.work.put(None)  # shutdown after the queue drains
    t = threading.Thread(
        target=_worker_loop, args=(store, run_job, run_jobs_batch, 4)
    )
    t.start()
    t.join(timeout=10)
    assert not t.is_alive()
    assert batches == [["p0", "p1", "p2"]]
    for i, job in enumerate(jobs):
        assert job.status == "done"
        assert job.output_path.endswith(f"p{i}.mp4")


def test_batch_failure_marks_all_failed_and_lone_job_uses_single_path(tmp_path):
    from motionclone_tpu.serve import JobStore, _worker_loop

    store = JobStore(max_queue=8)
    pair = [
        store.submit({"video_path": "v.mp4", "new_prompt": f"p{i}"})
        for i in range(2)
    ]

    def run_jobs_batch(examples):
        raise RuntimeError("sweep exploded")

    def run_job(example):
        return str(tmp_path / "single.mp4")

    store.work.put(None)
    t = threading.Thread(
        target=_worker_loop, args=(store, run_job, run_jobs_batch, 4)
    )
    t.start()
    t.join(timeout=10)
    assert all(j.status == "failed" for j in pair)
    assert all("sweep exploded" in j.error for j in pair)

    # a lone queued job takes the single-job path even with a batch runner
    store2 = JobStore(max_queue=8)
    lone = store2.submit({"video_path": "v.mp4", "new_prompt": "solo"})
    store2.work.put(None)
    t2 = threading.Thread(
        target=_worker_loop,
        args=(store2, run_job, lambda ex: 1 / 0, 4),
    )
    t2.start()
    t2.join(timeout=10)
    assert lone.status == "done" and lone.output_path.endswith("single.mp4")


def test_job_timeout_fails_wedged_job_and_queue_keeps_draining(tmp_path):
    """A wedged job (e.g. a hung TPU dispatch) must fail at job_timeout and
    the worker must keep serving the queue (VERDICT r2 weak #7).  The
    abandoned runner thread's late completion must not resurrect the
    timed-out job (JobStore.finish terminal-state guard)."""
    wedge = threading.Event()

    def run_job(example):
        if example["new_prompt"] == "wedged":
            wedge.wait(timeout=30)  # far beyond the job timeout
            return str(tmp_path / "late.mp4")
        return str(tmp_path / "ok.mp4")

    srv = MotionCloneServer(run_job, port=0, max_queue=8, job_timeout=0.3)
    srv.start()
    try:
        _, body = _req(
            srv.port, "/generate",
            {"video_path": "v.mp4", "new_prompt": "wedged"},
        )
        wedged_id = json.loads(body)["job_id"]
        _, body = _req(
            srv.port, "/generate", {"video_path": "v.mp4", "new_prompt": "next"}
        )
        next_id = json.loads(body)["job_id"]

        failed = _wait_status(srv.port, wedged_id, "failed")
        assert "timeout" in failed["error"].lower()
        # the queue keeps draining past the wedged job
        done = _wait_status(srv.port, next_id, "done")
        assert done["output_path"].endswith("ok.mp4")

        # late completion of the abandoned thread must not flip the record
        wedge.set()
        time.sleep(0.2)
        _, body = _req(srv.port, f"/jobs/{wedged_id}")
        rec = json.loads(body)
        assert rec["status"] == "failed" and rec["output_path"] is None
        _, text = _req(srv.port, "/metrics")
        assert "motionclone_jobs_failed 1" in text
        assert "motionclone_jobs_done 1" in text
    finally:
        srv.shutdown()


def test_503_on_full_under_concurrent_submit_race(tmp_path):
    """Submit storm against a tiny queue while the worker is blocked: every
    response is 202 or 503, the number of job records equals the number of
    202s exactly (no phantom/lost records under the race), and the store
    stays bounded (VERDICT r2: 503-on-full behavior under race)."""
    release = threading.Event()

    def run_job(example):
        release.wait(timeout=30)
        return str(tmp_path / "out.mp4")

    srv = MotionCloneServer(run_job, port=0, max_queue=3)
    srv.start()
    try:
        codes, errors = [], []
        lock = threading.Lock()

        def submitter(i):
            try:
                for j in range(4):
                    code, _ = _req(
                        srv.port, "/generate",
                        {"video_path": "v.mp4", "new_prompt": f"p{i}-{j}"},
                    )
                    with lock:
                        codes.append(code)
            except Exception as e:
                errors.append(e)

        threads = [threading.Thread(target=submitter, args=(i,)) for i in range(5)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert not errors, errors
        assert set(codes) <= {202, 503} and 503 in codes
        # accepted == records (the running job may no longer be "queued")
        _, body = _req(srv.port, "/jobs")
        assert len(json.loads(body)["jobs"]) == codes.count(202)
        # bounded: 1 running + at most max_queue queued accepted
        assert codes.count(202) <= 1 + 3 + 1  # +1 for the put/get window
    finally:
        release.set()
        srv.shutdown()


def test_validation_rejects_type_malformed_fields():
    """Type-malformed fields must become ValueError (-> HTTP 400), never a
    TypeError that drops the connection (ADVICE r1): int image_index, bare
    string condition_image_paths (would silently split per character)."""
    base = {"video_path": "v.mp4", "new_prompt": "x"}
    with pytest.raises(ValueError, match="image_index"):
        _validate_example({**base, "image_index": 5})
    with pytest.raises(ValueError, match="condition_image_paths"):
        _validate_example({**base, "condition_image_paths": "a.png"})
    with pytest.raises(ValueError, match="seed"):
        _validate_example({**base, "seed": "7"})
    with pytest.raises(ValueError, match="controlnet_scale"):
        _validate_example({**base, "controlnet_scale": "big"})
    # the valid shapes still pass
    _validate_example(
        {**base, "condition_image_paths": ["a.png"], "image_index": [0],
         "controlnet_scale": 1.0, "seed": 7}
    )


def test_terminal_status_implies_complete_record(server):
    """A terminal job record always carries finished_at + seconds (the
    transition is atomic under the store lock, ADVICE r1)."""
    code, body = _req(
        server.port, "/generate", {"video_path": "v.mp4", "new_prompt": "a dog"}
    )
    job_id = json.loads(body)["job_id"]
    deadline = time.time() + 10
    while time.time() < deadline:
        _, body = _req(server.port, f"/jobs/{job_id}")
        rec = json.loads(body)
        if rec["status"] in ("done", "failed"):
            assert rec["finished_at"] is not None
            assert "seconds" in rec and rec["seconds"] >= 0
            return
        time.sleep(0.005)
    raise AssertionError("job never finished")


def test_terminal_job_retention_is_bounded_and_counters_monotonic(tmp_path):
    """Old terminal records are evicted past max_terminal, but the
    Prometheus counters keep counting (ADVICE r1: unbounded /jobs growth)."""
    from motionclone_tpu.serve import JobStore, _worker_loop

    store = JobStore(max_queue=16, max_terminal=3)
    jobs = [store.submit({"video_path": "v", "new_prompt": str(i)}) for i in range(8)]
    _worker_loop_once = threading.Thread(
        target=_worker_loop, args=(store, lambda ex: "out.mp4"), daemon=True
    )
    _worker_loop_once.start()
    store.work.join()
    store.shutting_down.set()
    store.work.put_nowait(None)
    _worker_loop_once.join(timeout=5)

    recs = store.all()
    assert len(recs) == 3  # only the newest 3 terminal records retained
    assert [r["job_id"] for r in recs] == [j.job_id for j in jobs[-3:]]
    c = store.counters()
    assert c["jobs_total"] == 8 and c["jobs_done"] == 8
    assert c["generate_seconds_count"] == 8
    # evicted ids 404 via get
    assert store.get(jobs[0].job_id) is None


def test_shutdown_never_blocks_on_full_queue():
    """shutdown() with a full work queue must return promptly via the
    shutting_down flag instead of blocking in queue.put (ADVICE r1)."""
    release = threading.Event()

    def slow_job(example):
        release.wait(timeout=10)
        return "out.mp4"

    srv = MotionCloneServer(slow_job, port=0, max_queue=1)
    srv.start()
    code, _ = _req(srv.port, "/generate", {"video_path": "v", "new_prompt": "a"})
    assert code == 202
    # fill the queue while the worker is busy
    deadline = time.time() + 5
    while time.time() < deadline:
        code, _ = _req(srv.port, "/generate", {"video_path": "v", "new_prompt": "b"})
        if code == 202 and srv.store.work.full():
            break
    t0 = time.time()
    release.set()
    srv.shutdown()
    assert time.time() - t0 < 15  # bounded: no indefinite block on put()
