"""Task queue tests: states, revoke, beat, time limits, stats."""
import time

import pytest


@pytest.fixture()
def queue():
    from vtd_tpu.serve.queue import TaskQueue

    q = TaskQueue(concurrency=2, soft_time_limit=0.5, hard_time_limit=1.0)
    yield q
    q.shutdown()


def test_task_lifecycle(queue):
    @queue.task(name="add")
    def add(self, a, b):
        return a + b

    res = add.delay(2, 3)
    assert res.get(timeout=30) == 5
    assert res.state == "SUCCESS"
    assert res.ready() and res.successful()


def test_task_failure_traceback(queue):
    @queue.task(name="boom")
    def boom(self):
        raise ValueError("kapow")

    res = boom.delay()
    with pytest.raises(RuntimeError):
        res.get(timeout=30)
    assert res.state == "FAILURE"
    assert "kapow" in res.traceback


def test_progress_state(queue):
    @queue.task(name="prog")
    def prog(self):
        self.update_state(state="PROGRESS", meta={"progress": 50})
        time.sleep(0.1)
        return "done"

    res = prog.delay()
    deadline = time.time() + 5
    seen_progress = False
    while time.time() < deadline and not res.ready():
        if res.state == "PROGRESS" and (res.info or {}).get("progress") == 50:
            seen_progress = True
        time.sleep(0.01)
    assert res.get(timeout=30) == "done"
    assert seen_progress


def test_revoke_pending(queue):
    import threading

    gate = threading.Event()

    @queue.task(name="slow")
    def slow(self):
        gate.wait(timeout=10)
        return "x"

    # fill both workers, then queue a third and revoke it
    r1, r2 = slow.delay(), slow.delay()
    r3 = slow.delay()
    time.sleep(0.2)
    assert queue.revoke(r3.id)
    gate.set()
    r1.get(timeout=5)
    r2.get(timeout=5)
    time.sleep(0.3)
    assert r3.state == "REVOKED"


def test_soft_limit_sets_cancel_flag(queue):
    @queue.task(name="looper")
    def looper(self):
        for _ in range(100):
            if self.is_revoked():
                return "cancelled"
            time.sleep(0.05)
        return "finished"

    res = looper.delay()
    assert res.get(timeout=10) == "cancelled"  # soft limit 0.5 s


def test_soft_limited_completion_is_success_not_revoked(queue):
    """A task that outruns (or ignores) the soft-limit nudge and returns
    a result is a SUCCESS — only an explicit revoke() yields REVOKED
    (Celery parity: swallowing SoftTimeLimitExceeded keeps the result)."""
    queue.hard_time_limit = 60.0  # only the soft limit in play here

    @queue.task(name="slowpoke")
    def slowpoke(self):
        time.sleep(0.8)  # past the 0.5 s soft limit, ignores the flag
        return 42

    res = slowpoke.delay()
    assert res.get(timeout=10) == 42
    assert res.state == "SUCCESS"


def test_explicit_revoke_observed_is_revoked(queue):
    @queue.task(name="looper2")
    def looper2(self):
        for _ in range(200):
            if self.is_revoked():
                return "stopped"
            time.sleep(0.02)
        return "finished"

    res = looper2.delay()
    time.sleep(0.1)
    queue.revoke(res.id)
    deadline = time.time() + 10
    while res.state not in ("REVOKED", "SUCCESS", "FAILURE"):
        assert time.time() < deadline
        time.sleep(0.05)
    assert res.state == "REVOKED"
    assert res.result == "stopped"


def test_hard_limit_fires_failure_hooks(queue):
    """Queue-level terminal failures must deliver failure/postrun
    signals (DB-sync hooks depend on them)."""
    failures, postruns = [], []
    queue.on_failure.append(lambda rec, exc: failures.append(rec.id))
    queue.on_postrun.append(lambda rec: postruns.append(rec.state))

    @queue.task(name="hog")
    def hog(self):
        time.sleep(30)  # never polls is_revoked
        return "done"

    queue.hard_time_limit = 1.0
    res = hog.delay()
    deadline = time.time() + 15
    while res.state != "FAILURE":
        assert time.time() < deadline, res.state
        time.sleep(0.1)
    assert res.id in failures
    assert "FAILURE" in postruns


def test_stats_and_hooks(queue):
    seen = []
    queue.on_postrun.append(lambda rec: seen.append(rec.state))

    @queue.task(name="ok")
    def ok(self):
        return 1

    ok.delay().get(timeout=5)
    stats = queue.stats()
    assert stats["completed"] >= 1
    assert seen and seen[-1] == "SUCCESS"
