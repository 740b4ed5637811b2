"""Shared rate-limit window store.

The reference enforced rate limits through Redis so N API replicas
shared one counter (app/api/middleware.py:69-116); the sqlite-file
store gives the same multi-replica semantics without an extra service.
"""
import subprocess
import sys
import time


def test_sqlite_store_counts_and_expires(tmp_path):
    from vtd_tpu.serve.middleware import SqliteWindowStore

    store = SqliteWindowStore(str(tmp_path / "rl.db"))
    for i in range(1, 6):
        assert store.incr_window("k", 60.0) == i
    # a short window expires and the count resets
    assert store.incr_window("fast", 0.05) == 1
    time.sleep(0.08)
    assert store.incr_window("fast", 0.05) == 1


def test_sqlite_store_shared_across_processes(tmp_path):
    from vtd_tpu.serve.middleware import SqliteWindowStore

    db = str(tmp_path / "rl.db")
    store = SqliteWindowStore(db)
    for _ in range(5):
        store.incr_window("shared", 60.0)
    # a second "replica" process sees and extends the same window
    out = subprocess.run(
        [
            sys.executable, "-c",
            "from vtd_tpu.serve.middleware import SqliteWindowStore;"
            f"s = SqliteWindowStore({db!r});"
            "print(max(s.incr_window('shared', 60.0) for _ in range(5)))",
        ],
        capture_output=True, text=True, timeout=60,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin",
             "PYTHONPATH": "/root/repo"},
    )
    assert out.returncode == 0, out.stderr
    assert int(out.stdout.strip()) == 10
    # and this replica continues from the shared count
    assert store.incr_window("shared", 60.0) == 11


def test_make_window_store_dispatch(tmp_path):
    from vtd_tpu.serve.middleware import (
        InMemoryWindowStore,
        SqliteWindowStore,
        make_window_store,
    )

    assert isinstance(make_window_store("memory://"), InMemoryWindowStore)
    s = make_window_store(f"sqlite:///{tmp_path}/x.db")
    assert isinstance(s, SqliteWindowStore)


def test_rate_limit_middleware_with_sqlite_store(tmp_path):
    """429 after the /processing budget (5/min) is spent, via the shared
    store (limits parity: reference middleware.py:81-89)."""
    from vtd_tpu.serve.middleware import (
        SqliteWindowStore,
        make_rate_limit_middleware,
    )
    from vtd_tpu.serve.http import Request, Response

    mw = make_rate_limit_middleware(SqliteWindowStore(str(tmp_path / "r.db")))

    def make_req():
        r = Request.__new__(Request)
        r.method = "POST"
        r.path = "/api/v1/processing/videos/1/detect"
        r.client_ip = "10.0.0.1"
        return r

    ok = lambda request: Response(200, {})  # noqa: E731
    statuses = [mw(make_req(), ok).status_code for _ in range(7)]
    assert statuses[:5] == [200] * 5
    assert statuses[5] == statuses[6] == 429


def test_sqlite_store_gc_expired_rows(tmp_path):
    """Expired windows are swept opportunistically — distinct keys must
    not grow the shared table unboundedly (the in-memory store GCs;
    the long-lived sqlite store must too)."""
    from vtd_tpu.serve.middleware import SqliteWindowStore

    store = SqliteWindowStore(str(tmp_path / "gc.db"))
    store._GC_EVERY = 8  # force frequent sweeps for the test
    # age out a batch of keys far in the past
    con = store._conn()
    import time as _t

    old = _t.time() - 10_000
    for i in range(50):
        con.execute(
            "INSERT OR REPLACE INTO rate_windows VALUES (?,?,?)",
            (f"stale:{i}", 3, old),
        )
    con.commit()
    for i in range(16):  # > _GC_EVERY increments triggers the sweep
        store.incr_window(f"live:{i}", 60.0)
    n = con.execute("SELECT COUNT(*) FROM rate_windows").fetchone()[0]
    assert n <= 16, f"stale rows survived GC: {n}"
