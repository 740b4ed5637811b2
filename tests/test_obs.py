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
