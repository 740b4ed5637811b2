"""Prometheus metrics — series-name parity with reference
``app/monitoring/metrics.py:10-33`` so existing dashboards keep working,
plus TPU-specific series (device step latency, crop batch occupancy).
"""
from __future__ import annotations

import logging
import time
from typing import Any, Dict

logger = logging.getLogger(__name__)

try:
    import psutil

    _HAVE_PSUTIL = True
except ImportError:  # pragma: no cover
    _HAVE_PSUTIL = False

from prometheus_client import (
    REGISTRY,
    Counter,
    Gauge,
    Histogram,
    Info,
    start_http_server,
)


def _get_or_create(cls, name, doc, **kw):
    """Idempotent metric construction (tests import this module from
    several entry points; re-registering the same name raises)."""
    try:
        return cls(name, doc, **kw)
    except ValueError:
        return REGISTRY._names_to_collectors[name]  # type: ignore[attr-defined]


video_uploads_total = _get_or_create(
    Counter, "video_uploads_total", "Total video uploads",
    labelnames=["category", "status"],
)
video_processing_duration = _get_or_create(
    Histogram, "video_processing_duration_seconds", "Video processing duration"
)
active_processing_jobs = _get_or_create(
    Gauge, "active_processing_jobs", "Number of active processing jobs"
)
text_detections_total = _get_or_create(
    Counter, "text_detections_total", "Total text detections",
    labelnames=["model_type"],
)
system_cpu_usage = _get_or_create(
    Gauge, "system_cpu_usage_percent", "System CPU usage percentage"
)
system_memory_usage = _get_or_create(
    Gauge, "system_memory_usage_bytes", "System memory usage in bytes"
)
system_memory_total = _get_or_create(
    Gauge, "system_memory_total_bytes", "Total system memory in bytes"
)
disk_usage = _get_or_create(
    Gauge, "disk_usage_bytes", "Disk usage in bytes", labelnames=["path"]
)
disk_total = _get_or_create(
    Gauge, "disk_total_bytes", "Total disk space in bytes", labelnames=["path"]
)
database_connections = _get_or_create(
    Gauge, "database_connections_active", "Active database connections"
)
database_query_duration = _get_or_create(
    Histogram, "database_query_duration_seconds", "Database query duration"
)
model_inference_duration = _get_or_create(
    Histogram, "model_inference_duration_seconds", "Model inference duration",
    labelnames=["model_type"],
)
model_batch_size = _get_or_create(
    Histogram, "model_batch_size", "Model batch size",
    labelnames=["model_type"],
)
celery_tasks_total = _get_or_create(
    Counter, "celery_tasks_total", "Total worker tasks",
    labelnames=["task_name", "status"],
)
celery_task_duration = _get_or_create(
    Histogram, "celery_task_duration_seconds", "Worker task duration",
    labelnames=["task_name"],
)
app_info = _get_or_create(Info, "app_info", "Application information")

# TPU-native additions
tpu_step_duration = _get_or_create(
    Histogram, "tpu_step_duration_seconds",
    "Fused device step (preprocess+detect+postprocess+crop) duration",
    labelnames=["stage"],
)
recognizer_chunk_occupancy = _get_or_create(
    Histogram, "recognizer_chunk_occupancy",
    "Fraction of recognizer chunk slots holding real crops",
)


class MetricsCollector:
    """record_* helpers + 60 s-throttled system sampler (parity with
    reference MetricsCollector, metrics.py:35-132)."""

    def __init__(self):
        self.last_system_update = 0.0
        self.update_interval = 60.0

    def update_system_metrics(self) -> None:
        now = time.time()
        if now - self.last_system_update < self.update_interval:
            return
        if not _HAVE_PSUTIL:
            return
        try:
            system_cpu_usage.set(psutil.cpu_percent(interval=None))
            mem = psutil.virtual_memory()
            system_memory_usage.set(mem.used)
            system_memory_total.set(mem.total)
            disk = psutil.disk_usage("/")
            disk_usage.labels(path="/").set(disk.used)
            disk_total.labels(path="/").set(disk.total)
            self.last_system_update = now
        except Exception as e:
            logger.warning("system metrics update failed: %s", e)

    def record_video_upload(self, category: str = "other", status: str = "success"):
        video_uploads_total.labels(category or "other", status).inc()

    def record_processing_duration(self, seconds: float):
        video_processing_duration.observe(seconds)

    def record_text_detections(self, count: int, model_type: str = "DBNet-CRNN"):
        text_detections_total.labels(model_type).inc(count)

    def record_model_inference(self, seconds: float, model_type: str, batch: int):
        model_inference_duration.labels(model_type).observe(seconds)
        model_batch_size.labels(model_type).observe(batch)

    def record_task(self, task_name: str, status: str, duration: float):
        celery_tasks_total.labels(task_name, status).inc()
        celery_task_duration.labels(task_name).observe(duration)

    def set_active_jobs(self, n: int):
        active_processing_jobs.set(n)

    def set_database_status(self, connected: bool):
        database_connections.set(1 if connected else 0)

    def set_app_info(self, info: Dict[str, str]):
        app_info.info(info)


metrics_collector = MetricsCollector()


def start_metrics_server(port: int = 9091) -> None:
    """Standalone worker-side metrics server (celery_app.py:60-62,
    metrics.py:136-141)."""
    try:
        start_http_server(port)
        logger.info("Metrics server on :%d", port)
    except OSError as e:
        logger.warning("metrics server not started: %s", e)
