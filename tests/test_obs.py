"""Observability tests: metrics collector + health checks."""
import asyncio

import pytest


@pytest.fixture(autouse=True)
def _db():
    from vtd_tpu.serve.db.database import Database, set_database

    db = Database("sqlite://")
    db.init_db()
    set_database(db)
    yield


def test_metrics_collector_records():
    from prometheus_client import generate_latest

    from vtd_tpu.obs.metrics import metrics_collector

    metrics_collector.record_video_upload("sports", "success")
    metrics_collector.record_text_detections(5)
    metrics_collector.record_model_inference(0.01, "DBNet", 8)
    metrics_collector.record_task("process_video_task", "SUCCESS", 1.5)
    metrics_collector.set_active_jobs(2)
    metrics_collector.update_system_metrics()

    text = generate_latest().decode()
    for series in (
        "video_uploads_total",
        "text_detections_total",
        "model_inference_duration_seconds",
        "celery_tasks_total",
        "active_processing_jobs",
    ):
        assert series in text


def test_health_checks_run_all():
    from vtd_tpu.obs.health import HealthCheck

    checks = asyncio.run(HealthCheck().run_all())
    assert set(checks) >= {
        "database", "queue", "disk", "memory", "models", "accelerator",
        "external_apis",
    }
    assert checks["database"]["status"] == "healthy"
    assert checks["queue"]["status"] == "healthy"
    assert checks["accelerator"]["count"] == 8  # virtual CPU mesh


def test_health_monitor_caching_and_probes():
    from vtd_tpu.obs.health import HealthMonitor

    mon = HealthMonitor(cache_seconds=60)
    h1 = asyncio.run(mon.get_health())
    h2 = asyncio.run(mon.get_health())
    assert h1 is h2  # cached
    ready = asyncio.run(mon.readiness())
    assert ready["ready"] is True
    live = asyncio.run(mon.liveness())
    assert live["alive"] is True


def test_health_endpoints_in_app(tmp_path, monkeypatch):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.app import create_app
    from vtd_tpu.serve.http import TestClient

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "t"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "o"))
    monkeypatch.setattr(settings, "model_path", str(tmp_path / "m"))
    client = TestClient(create_app(start_worker=False))
    assert client.get("/health/detailed").status_code == 200
    assert client.get("/health/ready").status_code == 200
    assert client.get("/health/live").status_code == 200


def test_accelerator_probe_single_outstanding(monkeypatch):
    """A wedged runtime must leak at most ONE probe thread: while a
    probe is stuck, later polls report unhealthy immediately instead of
    stacking threads and queued device programs."""
    import threading
    import time

    from vtd_tpu.obs.health import HealthCheck

    hc = HealthCheck()
    release = threading.Event()

    class _StuckThread(threading.Thread):
        """Stands in for a probe blocked in block_until_ready."""

        def __init__(self, target=None, daemon=None):
            super().__init__(target=lambda: release.wait(10), daemon=True)

    monkeypatch.setattr(
        "vtd_tpu.obs.health.threading.Thread", _StuckThread
    )
    # shorten the join deadline via a wrapper: call the real check but
    # don't wait 10 s — patch Thread.join to time out instantly
    orig_join = threading.Thread.join
    monkeypatch.setattr(
        threading.Thread, "join",
        lambda self, timeout=None: orig_join(self, 0.05),
    )
    try:
        first = asyncio.run(hc.check_accelerator())
        assert first["status"] == "unhealthy"
        assert "timed out" in first["error"]
        n_before = threading.active_count()
        second = asyncio.run(hc.check_accelerator())
        assert second["status"] == "unhealthy"
        assert "outstanding" in second["error"]
        assert threading.active_count() == n_before  # no new thread
    finally:
        release.set()
        monkeypatch.undo()
        time.sleep(0.05)
        type(hc)._probe_thread = None
