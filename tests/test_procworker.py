"""Process-based worker pool: Celery prefork parity.

The reference's Celery worker enforces the hard time limit with SIGKILL
and recycles children every 10 tasks (app/celery_app.py:23-26); the
thread backend can only mark-but-not-stop. These tests exercise the
process pool's kill/recycle/worker-lost semantics.
"""
import time

import pytest

import proc_tasks
from vtd_tpu.serve.queue import TaskQueue


def make_queue(**kw):
    defaults = dict(
        worker_kind="process", tasks_module="proc_tasks", concurrency=1,
        max_tasks_per_child=10,
    )
    defaults.update(kw)
    q = TaskQueue(**defaults)
    # parent-side registration mirrors the child's module registry
    for t in (proc_tasks.add, proc_tasks.sleepy, proc_tasks.hang,
              proc_tasks.whoami, proc_tasks.crash):
        q.task(name=t.name)(t.fn)
    return q


def wait_for(pred, timeout=30.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


@pytest.fixture
def q():
    queue = make_queue()
    yield queue
    queue.shutdown()


def test_process_worker_runs_tasks(q):
    res = q.tasks["add"].delay(2, 3)
    assert res.get(timeout=60) == 5
    assert q.stats()["completed"] == 1


def test_hard_limit_kills_uncooperative_task():
    q = make_queue(soft_time_limit=0.5, hard_time_limit=1.2)
    try:
        res = q.tasks["hang"].delay(60)
        assert wait_for(lambda: res.state == "FAILURE", timeout=60)
        assert "hard time limit" in str(res.result)
        # a fresh child replaces the killed one
        assert wait_for(lambda: q._pool.alive_workers() >= 1, timeout=30)
        # and the pool still works
        res2 = q.tasks["add"].delay(1, 1)
        assert res2.get(timeout=60) == 2
    finally:
        q.shutdown()


def test_soft_limit_cancels_cooperative_task():
    q = make_queue(soft_time_limit=0.4, hard_time_limit=30.0)
    try:
        res = q.tasks["sleepy"].delay(60)
        # cooperative task sees the revocation flag and unwinds -> REVOKED
        assert wait_for(lambda: res.state == "REVOKED", timeout=60), res.state
    finally:
        q.shutdown()


def test_revoke_terminate_kills_running_task(q):
    res = q.tasks["hang"].delay(60)
    assert wait_for(lambda: res.state == "STARTED", timeout=60)
    q.revoke(res.id, terminate=True)
    assert wait_for(lambda: res.state == "REVOKED", timeout=30), res.state


def test_max_tasks_per_child_recycles():
    q = make_queue(max_tasks_per_child=2)
    try:
        # 4 sequential results with a pool recycle after every 2nd task:
        # each recycle is a full interpreter spawn (+imports), which can
        # take tens of seconds on a loaded 1-core CI host — budget each
        # get generously or the test flakes under a parallel suite.
        pids = [q.tasks["whoami"].delay().get(timeout=300) for _ in range(4)]
        assert len(set(pids)) >= 2, pids
    finally:
        q.shutdown()


def test_worker_lost_marks_failure(q):
    res = q.tasks["crash"].delay()
    assert wait_for(lambda: res.state == "FAILURE", timeout=60)
    assert "worker lost" in str(res.result)
    res2 = q.tasks["add"].delay(3, 4)
    assert res2.get(timeout=60) == 7
