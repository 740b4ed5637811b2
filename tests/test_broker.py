"""Multi-host work distribution: FileBroker + brokered TaskQueue.

The acceptance test runs TWO real worker *processes* draining one
shared queue — the rebuild's equivalent of the reference's N Celery
workers on one Redis broker (reference app/celery_app.py:14-34).
"""
import os
import subprocess
import sys
import time

WORKER_SRC = r"""
import os, sys, time
sys.path.insert(0, os.getcwd())  # script runs from the repo root
from vtd_tpu.serve.broker import FileBroker
from vtd_tpu.serve.queue import TaskQueue

root, worker_name = sys.argv[1], sys.argv[2]
q = TaskQueue(concurrency=2, broker=FileBroker(root, worker_name))

@q.task(name="work")
def work(self, i):
    # rendezvous: mark this worker as participating, then wait for the
    # producer's 'go' so BOTH processes hold claimed tasks concurrently
    open(os.path.join(root, "seen_" + worker_name), "w").close()
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(root, "go")):
        if time.time() > deadline:
            raise TimeoutError("rendezvous timeout")
        time.sleep(0.05)
    return {"i": i, "worker": worker_name}

q.start_workers()
deadline = time.time() + 180
while time.time() < deadline:
    if q.broker.pending_count() == 0 and not any(
        r.state in ("STARTED", "PROGRESS") for r in q.records.values()
    ):
        time.sleep(0.3)  # let final states flush
        break
    time.sleep(0.1)
print("WORKER_DONE", worker_name)
"""


def test_two_processes_drain_one_queue(tmp_path):
    from vtd_tpu.serve.broker import FileBroker
    from vtd_tpu.serve.queue import TaskQueue

    root = str(tmp_path / "broker")
    producer = TaskQueue(concurrency=0, broker=FileBroker(root, "producer"))

    @producer.task(name="work")
    def work(self, i):  # registration only; producer never runs it
        raise AssertionError("producer must not execute tasks")

    results = [work.delay(i) for i in range(12)]

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(WORKER_SRC)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [
        subprocess.Popen(
            [sys.executable, script, root, f"w{k}"],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for k in range(2)
    ]
    outs = []
    try:
        # wait until both worker processes hold a claimed task, then go
        deadline = time.time() + 120
        while not all(
            os.path.exists(os.path.join(root, f"seen_w{k}"))
            for k in range(2)
        ):
            assert time.time() < deadline, "workers failed to rendezvous"
            dead = [p for p in procs if p.poll() is not None]
            assert not dead, [p.communicate()[0] for p in dead]
            time.sleep(0.1)
        open(os.path.join(root, "go"), "w").close()
        for r in results:
            assert r.get(timeout=180)["i"] is not None
    finally:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=180)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            outs.append(out)

    workers_seen = {r.result["worker"] for r in results}
    assert all(r.successful() for r in results), outs
    assert workers_seen == {"w0", "w1"}, (workers_seen, outs)


def test_broker_claim_is_exclusive(tmp_path):
    from vtd_tpu.serve.broker import FileBroker

    a = FileBroker(str(tmp_path), "a")
    b = FileBroker(str(tmp_path), "b")
    a.enqueue("t1", "work", (1,), {})
    pa, pb = a.claim(), b.claim()
    assert (pa is None) != (pb is None)  # exactly one winner


def test_requeue_stale_reclaims_dead_worker_task(tmp_path):
    from vtd_tpu.serve.broker import FileBroker

    br = FileBroker(str(tmp_path), "dead", heartbeat_timeout=0.2)
    br.enqueue("t1", "work", (), {})
    claimed = br.claim()
    assert claimed and claimed["id"] == "t1"
    time.sleep(0.3)  # heartbeat goes stale (worker "died")
    assert br.requeue_stale() == ["t1"]
    again = FileBroker(str(tmp_path), "alive").claim()
    assert again and again["id"] == "t1"


def test_revoke_via_broker(tmp_path):
    from vtd_tpu.serve.broker import FileBroker

    br = FileBroker(str(tmp_path), "w")
    br.enqueue("t1", "work", (), {})
    br.revoke("t1")
    assert br.claim() is None  # revoked-while-pending never runs
    assert br.get_state("t1")["state"] == "REVOKED"


def test_claim_order_is_fifo_by_enqueue_time(tmp_path):
    """uuid filenames sort randomly — claims must follow enqueue order
    (mtime) or a task can be starved behind later tasks with smaller
    uuids."""
    import os
    import time

    from vtd_tpu.serve.broker import FileBroker

    br = FileBroker(str(tmp_path), "w")
    ids = ["zzz-first", "aaa-second", "mmm-third"]  # adversarial names
    for i, tid in enumerate(ids):
        br.enqueue(tid, "work", (), {})
        # force distinct mtimes regardless of filesystem resolution
        os.utime(br._p("pending", tid), (i, i))
    claimed = [br.claim()["id"] for _ in ids]
    for tid in claimed:
        br.finish(tid)
    assert claimed == ids


def test_finish_cleans_revoke_marker_and_gc_expires_state(tmp_path):
    import os

    from vtd_tpu.serve.broker import FileBroker

    br = FileBroker(str(tmp_path), "w", result_ttl=0.0)
    br.enqueue("t1", "work", (), {})
    br.revoke("t1")
    assert br.is_revoked("t1")
    br.finish("t1")
    assert not br.is_revoked("t1")  # marker removed with the task

    br.set_state("t2", {"state": "SUCCESS"})
    # age the state file past the (zero) ttl and run the sweep
    p = br._p("state", "t2")
    os.utime(p, (0, 0))
    br._last_gc = 0.0
    br._gc_expired(now=10_000_000.0)
    assert br.get_state("t2") is None


def test_init_distributed_noop_without_env(monkeypatch):
    from vtd_tpu.core import mesh

    for var in ("VTD_COORDINATOR_ADDRESS", "VTD_NUM_PROCESSES",
                "VTD_PROCESS_ID"):
        monkeypatch.delenv(var, raising=False)
    assert mesh.init_distributed() is False  # single-process mode


def test_broker_from_settings_scheme_validation(monkeypatch, tmp_path):
    """Unknown broker URL schemes must raise at startup — a redis:// URL
    from a reference-style deployment silently degrading to the
    in-process queue turned an intended multi-host fleet into a
    single-node deployment with no error (round-4 verdict)."""
    import pytest

    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.broker import FileBroker
    from vtd_tpu.serve.queue import _broker_from_settings

    monkeypatch.setattr(settings, "celery_broker_url", "local://",
                        raising=False)
    assert _broker_from_settings() is None

    shared = tmp_path / "shared"
    monkeypatch.setattr(settings, "celery_broker_url", f"file://{shared}",
                        raising=False)
    br = _broker_from_settings()
    assert isinstance(br, FileBroker)

    monkeypatch.setattr(settings, "celery_broker_url",
                        "redis://localhost:6379/0", raising=False)
    with pytest.raises(ValueError, match="redis"):
        _broker_from_settings()


PROGRESS_WORKER_SRC = r"""
import os, sys, time
sys.path.insert(0, os.getcwd())
from vtd_tpu.serve.broker import FileBroker
from vtd_tpu.serve.queue import TaskQueue

root = sys.argv[1]
q = TaskQueue(concurrency=2, broker=FileBroker(root, "pw"))

@q.task(name="work2")
def work2(self, i):
    # publish PROGRESS through the broker, then hold the slot until the
    # producer (another process) has seen it and revoked the pending task
    self.update_state("PROGRESS", {"i": i, "pct": 50})
    deadline = time.time() + 120
    while not os.path.exists(os.path.join(root, "go")):
        if time.time() > deadline:
            raise TimeoutError("rendezvous timeout")
        time.sleep(0.05)
    return {"i": i}

q.start_workers()
deadline = time.time() + 180
while time.time() < deadline:
    if q.broker.pending_count() == 0 and not any(
        r.state in ("STARTED", "PROGRESS") for r in q.records.values()
    ):
        time.sleep(0.3)
        break
    time.sleep(0.1)
print("WORKER_DONE")
"""


def test_progress_and_revoke_cross_process(tmp_path):
    """Producer and worker in different processes: PROGRESS metadata
    published by the worker is visible to the producer through the
    shared broker, and a producer-side revoke of a still-pending task
    prevents the worker from ever running it."""
    from vtd_tpu.serve.broker import FileBroker
    from vtd_tpu.serve.queue import TaskQueue

    root = str(tmp_path / "broker")
    producer = TaskQueue(concurrency=0, broker=FileBroker(root, "producer"))

    @producer.task(name="work2")
    def work2(self, i):
        raise AssertionError("producer must not execute tasks")

    # 2 claimed by the worker's 2 slots + 1 left pending for the revoke
    results = [work2.delay(i) for i in range(3)]

    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(PROGRESS_WORKER_SRC)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, script, root], cwd="/root/repo", env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        br = producer.broker
        deadline = time.time() + 120
        in_progress = set()
        while len(in_progress) < 2:
            assert time.time() < deadline, (
                "never saw 2 cross-process PROGRESS states",
                [br.get_state(r.id) for r in results],
            )
            assert proc.poll() is None, proc.communicate()[0]
            for r in results:
                st = br.get_state(r.id)
                if st and st.get("state") == "PROGRESS":
                    assert st.get("info", {}).get("pct") == 50
                    in_progress.add(r.id)
            time.sleep(0.1)
        (pending,) = [r for r in results if r.id not in in_progress]
        assert producer.revoke(pending.id)
        # revoked-while-pending must be dropped by the shared queue
        st = br.get_state(pending.id)
        assert st and st["state"] == "REVOKED", st
        open(os.path.join(root, "go"), "w").close()
        done = [r for r in results if r.id in in_progress]
        for r in done:
            assert r.get(timeout=180)["i"] is not None
    finally:
        try:
            out, _ = proc.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            proc.kill()
            out, _ = proc.communicate()
    assert "WORKER_DONE" in out, out
    final = producer.broker.get_state(pending.id)
    assert final and final["state"] == "REVOKED", (final, out)


DIST_WORKER_SRC = r"""
import os, sys
sys.path.insert(0, os.getcwd())
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
from vtd_tpu.core import mesh

coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
assert mesh.init_distributed(coord, nproc, pid) is True
assert mesh.init_distributed(coord, nproc, pid) is True  # idempotent
devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
m = mesh.make_mesh(n_data=len(devs), n_model=1, devices=devs)
start, size = mesh.local_batch_slice(8, m)
print("SLICE", pid, jax.process_count(), jax.device_count(),
      jax.local_device_count(), start, size, flush=True)
"""


def test_two_process_jax_distributed_init(tmp_path):
    """Real multi-host wiring on CPU: two processes run
    ``jax.distributed.initialize`` through ``init_distributed``, both
    see the 4-device global set, and ``local_batch_slice`` hands each a
    disjoint contiguous half of the global batch."""
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    script = str(tmp_path / "dist_worker.py")
    with open(script, "w") as f:
        f.write(DIST_WORKER_SRC)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, script, coord, "2", str(k)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for k in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    slices = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SLICE"):
                _, pid, pc, dc, ldc, start, size = line.split()
                assert (pc, dc, ldc) == ("2", "4", "2"), out
                slices[int(pid)] = (int(start), int(size))
    assert slices == {0: (0, 4), 1: (4, 4)}, (slices, outs)
