"""Network (TCP) broker: the no-shared-filesystem multi-host transport.

Mirrors the FileBroker battery (tests/test_broker.py) over real
sockets, plus auth and a cross-process TaskQueue drain — the rebuild's
equivalent of N Celery workers on one Redis server (reference
``app/celery_app.py:14-34``).
"""
import os
import subprocess
import sys
import time

import pytest


@pytest.fixture()
def server():
    from vtd_tpu.serve.brokerd import BrokerServer

    srv = BrokerServer("127.0.0.1", 0, heartbeat_timeout=0.2,
                       reap_interval=3600.0)  # manual reaping in tests
    srv.start()
    try:
        yield srv
    finally:
        srv.shutdown()


def _client(srv, name="w"):
    from vtd_tpu.serve.brokerd import TcpBroker

    return TcpBroker(srv.host, srv.port, worker_id=name)


def test_ping_and_roundtrip(server):
    br = _client(server)
    assert br.ping()
    br.enqueue("t1", "work", (1, 2), {"k": "v"}, queue="q")
    assert br.pending_count() == 1
    assert br.get_state("t1")["state"] == "PENDING"
    p = br.claim()
    assert p["id"] == "t1" and p["args"] == [1, 2]
    assert p["kwargs"] == {"k": "v"} and p["claimed_by"] == "w"
    br.set_state("t1", {"state": "SUCCESS", "result": 3})
    assert br.get_state("t1")["result"] == 3
    br.finish("t1")
    assert br.pending_count() == 0


def test_claim_is_exclusive(server):
    a, b = _client(server, "a"), _client(server, "b")
    a.enqueue("t1", "work", (), {})
    pa, pb = a.claim(), b.claim()
    assert (pa is None) != (pb is None)  # exactly one winner


def test_claim_order_fifo_and_requeue_keeps_position(server):
    br = _client(server)
    for tid in ("zzz-first", "aaa-second", "mmm-third"):
        br.enqueue(tid, "work", (), {})
        time.sleep(0.01)
    first = br.claim()
    assert first["id"] == "zzz-first"
    # worker "dies": heartbeat goes stale; the SERVER reaper must put
    # the task back at the FRONT (original submit order), not the tail
    # (the client-side requeue_stale is deliberately a no-op)
    time.sleep(0.3)
    assert br.requeue_stale() == []
    assert server.state.requeue_stale() == ["zzz-first"]
    assert [br.claim()["id"] for _ in range(3)] == [
        "zzz-first", "aaa-second", "mmm-third"
    ]


def test_revoke_while_pending_never_runs(server):
    br = _client(server)
    br.enqueue("t1", "work", (), {})
    br.revoke("t1")
    assert br.is_revoked("t1")
    assert br.claim() is None
    assert br.get_state("t1")["state"] == "REVOKED"


def test_finish_cleans_revoke_marker(server):
    br = _client(server)
    br.enqueue("t1", "work", (), {})
    br.revoke("t1")
    br.finish("t1")
    assert not br.is_revoked("t1")


def test_state_ttl_gc(server):
    st = server.state
    st.result_ttl = 0.0
    br = _client(server)
    br.set_state("old", {"state": "SUCCESS"})
    st._last_gc = 0.0
    st.states["old"]["updated_at"] = 0.0
    st.requeue_stale()
    assert br.get_state("old") is None


def test_gc_never_expires_live_tasks(server):
    """A task stuck PENDING past result_ttl must keep its state AND its
    revoke marker — expiring the marker would let the revoked job run
    when finally claimed."""
    st = server.state
    st.result_ttl = 0.0
    br = _client(server)
    br.enqueue("stuck", "work", (), {})
    br.revoke("stuck")
    st._last_gc = 0.0
    st.states["stuck"]["updated_at"] = 0.0
    st.revoked["stuck"] = 0.0
    st.requeue_stale()  # runs _gc with everything past the cutoff
    assert br.get_state("stuck") is not None
    assert br.is_revoked("stuck")
    assert br.claim() is None  # revoke still honored at claim time


def test_auth_token():
    from vtd_tpu.serve.brokerd import BrokerServer, TcpBroker

    srv = BrokerServer("127.0.0.1", 0, token="s3cret")
    srv.start()
    try:
        good = TcpBroker(srv.host, srv.port, token="s3cret")
        assert good.ping()
        bad = TcpBroker(srv.host, srv.port, token="wrong")
        with pytest.raises(RuntimeError, match="auth"):
            bad.ping()
        missing = TcpBroker(srv.host, srv.port, token="")
        with pytest.raises(RuntimeError, match="auth"):
            missing.ping()
    finally:
        srv.shutdown()


def test_broker_from_settings_tcp(monkeypatch, server):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.brokerd import TcpBroker
    from vtd_tpu.serve.queue import _broker_from_settings

    monkeypatch.setattr(
        settings, "celery_broker_url",
        f"tcp://{server.host}:{server.port}", raising=False,
    )
    br = _broker_from_settings()
    assert isinstance(br, TcpBroker)
    assert br.ping()

    monkeypatch.setattr(settings, "celery_broker_url", "tcp://nohost",
                        raising=False)
    with pytest.raises(ValueError, match="malformed"):
        _broker_from_settings()


TCP_WORKER_SRC = r"""
import os, sys, time
sys.path.insert(0, os.getcwd())
from vtd_tpu.serve.brokerd import TcpBroker
from vtd_tpu.serve.queue import TaskQueue

host, port, worker_name, root = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4])
q = TaskQueue(
    concurrency=2, broker=TcpBroker(host, port, worker_id=worker_name)
)

@q.task(name="work")
def work(self, i):
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
        time.sleep(0.3)
        break
    time.sleep(0.1)
print("WORKER_DONE", worker_name)
"""


def test_two_processes_drain_tcp_queue(tmp_path):
    """Two worker PROCESSES drain one TCP-brokered queue — no shared
    filesystem anywhere in the task path (the rendezvous files stand in
    for 'holding a claimed task', not for transport)."""
    from vtd_tpu.serve.brokerd import BrokerServer, TcpBroker
    from vtd_tpu.serve.queue import TaskQueue

    srv = BrokerServer("127.0.0.1", 0)
    srv.start()
    root = str(tmp_path)
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(TCP_WORKER_SRC)
    try:
        producer = TaskQueue(
            concurrency=0,
            broker=TcpBroker(srv.host, srv.port, worker_id="producer"),
        )

        @producer.task(name="work")
        def work(self, i):
            raise AssertionError("producer must not execute tasks")

        results = [work.delay(i) for i in range(12)]

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        procs = [
            subprocess.Popen(
                [sys.executable, script, srv.host, str(srv.port),
                 f"w{k}", root],
                cwd="/root/repo", env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for k in range(2)
        ]
        outs = []
        try:
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
        assert all(r.successful() for r in results), outs
        assert {r.result["worker"] for r in results} == {"w0", "w1"}, outs
    finally:
        # stop the producer's monitor/beat threads BEFORE the server
        # goes away, or their heartbeats log connection errors
        try:
            producer.shutdown()
        except NameError:
            pass
        srv.shutdown()
