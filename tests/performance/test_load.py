"""Serving-layer load test over real sockets.

The reference's CI declares a k6 perf job pointing at
tests/performance/load-test.js, which does not exist in the repo
(SURVEY.md §4); this is the working equivalent: drive the real
threaded HTTP server (ThreadingHTTPServer + full middleware stack)
with concurrent clients and assert error-rate and tail-latency
budgets. Latency thresholds are deliberately loose (shared CI hosts);
the hard assertions are correctness under concurrency: no 5xx, no
dropped/garbled responses, monotone Prometheus counters.
"""
import http.client
import json
import threading
import time

import pytest


@pytest.fixture()
def live_server(tmp_path, monkeypatch):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve import middleware
    from vtd_tpu.serve.app import create_app
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.http import Server

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "temp"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "out"))
    # Load > 100 req/min per bucket by design; neutralize the fixed
    # window counter so the test measures the stack, not the limiter
    # (the limiter has its own tests in test_api/test_rate_limit_store).
    monkeypatch.setattr(
        middleware.InMemoryWindowStore, "incr_window", lambda *a, **k: 1
    )
    monkeypatch.setattr(
        middleware.SqliteWindowStore, "incr_window", lambda *a, **k: 1
    )
    db = Database("sqlite://")
    db.init_db()
    set_database(db)
    app = create_app(start_worker=False)
    server = Server(app, host="127.0.0.1", port=0)
    server.start_background()
    try:
        yield "127.0.0.1", server.port
    finally:
        server.shutdown()


def _get(host, port, path, headers=None):
    t0 = time.perf_counter()
    conn = http.client.HTTPConnection(host, port, timeout=30)
    try:
        conn.request("GET", path, headers=headers or {})
        r = conn.getresponse()
        body = r.read()
        return r.status, body, time.perf_counter() - t0
    finally:
        conn.close()


@pytest.mark.slow
def test_concurrent_load(live_server):
    host, port = live_server

    # one registered user for the authed endpoint
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request(
        "POST", "/api/v1/auth/register",
        body=json.dumps({
            "email": "load@example.com", "username": "loaduser",
            "password": "secret123",
        }),
        headers={"Content-Type": "application/json"},
    )
    r = conn.getresponse()
    assert r.status == 201, r.read()
    token = json.loads(r.read())["access_token"]
    conn.close()
    auth = {"Authorization": f"Bearer {token}"}

    workers, per_worker = 16, 24
    results = []
    errors = []
    lock = threading.Lock()

    def worker(wid):
        local = []
        try:
            for i in range(per_worker):
                if i % 3 == 0:
                    st, body, dt = _get(host, port, "/health")
                    ok = st == 200 and json.loads(body)["status"] in (
                        "healthy", "degraded"
                    )
                elif i % 3 == 1:
                    st, body, dt = _get(
                        host, port, "/api/v1/videos/", headers=auth
                    )
                    ok = st == 200 and isinstance(json.loads(body), list)
                else:
                    st, body, dt = _get(host, port, "/")
                    ok = st == 200 and b"status" in body
                local.append((st, ok, dt))
        except Exception as e:  # noqa: BLE001 - collect, assert later
            with lock:
                errors.append((wid, repr(e)))
        with lock:
            results.extend(local)

    threads = [
        threading.Thread(target=worker, args=(w,)) for w in range(workers)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    wall = time.perf_counter() - t0

    assert not errors, errors[:5]
    assert len(results) == workers * per_worker
    statuses = [s for s, _, _ in results]
    assert all(s == 200 for s in statuses), sorted(set(statuses))
    assert all(ok for _, ok, _ in results)
    lats = sorted(dt for _, _, dt in results)
    p95 = lats[int(len(lats) * 0.95)]
    # loose budgets: a stdlib threaded server on a 1-core CI host
    assert p95 < 5.0, f"p95 {p95:.3f}s"
    rps = len(results) / wall
    assert rps > 20, f"only {rps:.1f} req/s"


@pytest.mark.slow
def test_load_metrics_consistency(live_server):
    """Prometheus request counters survive concurrent scrapes+traffic."""
    host, port = live_server
    n = 40

    def hit():
        for _ in range(n):
            _get(host, port, "/health")

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    st, body, _ = _get(host, port, "/metrics")
    assert st == 200
    text = body.decode()
    total = 0.0
    for line in text.splitlines():
        if line.startswith("http_requests_total{") and '"/health"' in line:
            total += float(line.rsplit(" ", 1)[1])
    assert total >= 4 * n
