from .metrics import MetricsCollector, metrics_collector
from .health import HealthCheck, HealthMonitor, health_monitor

__all__ = [
    "MetricsCollector",
    "metrics_collector",
    "HealthCheck",
    "HealthMonitor",
    "health_monitor",
]
