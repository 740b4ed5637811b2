"""Application settings.

Field-parity with the reference's pydantic ``Settings`` (reference
``config.py:5-45``), extended with TPU-runtime knobs. Unlike the
reference, every field has a standalone-safe default so the framework
boots without a ``.env`` (the reference crashes without ``database_url``
/ ``secret_key`` / celery URLs).
"""
from __future__ import annotations

import os
from typing import List, Optional

try:  # pydantic v2 moved BaseSettings to pydantic-settings, which may be absent
    from pydantic_settings import BaseSettings  # type: ignore

    _HAVE_PYDANTIC_SETTINGS = True
except ImportError:  # pragma: no cover
    try:
        from pydantic import BaseSettings  # type: ignore

        _HAVE_PYDANTIC_SETTINGS = True
    except ImportError:
        BaseSettings = object  # type: ignore
        _HAVE_PYDANTIC_SETTINGS = False


if _HAVE_PYDANTIC_SETTINGS:

    class Settings(BaseSettings):  # type: ignore[misc,valid-type]
        app_name: str = "Video Text Detection API"
        debug: bool = False
        version: str = "1.0.0"

        # Persistence. sqlite by default; any DSN accepted by the db layer.
        database_url: str = "sqlite:///./vtd.db"
        redis_url: str = "redis://localhost:6379/0"

        # Auth (JWT HS256, parity with reference config.py:13-15).
        secret_key: str = "change-me-in-production"
        algorithm: str = "HS256"
        access_token_expire_minutes: int = 30

        # Object storage (S3-compatible), optional.
        aws_access_key_id: Optional[str] = None
        aws_secret_access_key: Optional[str] = None
        aws_region: str = "us-east-1"
        s3_bucket_name: Optional[str] = None

        # Upload constraints (reference config.py:22-24).
        max_file_size: int = 500 * 1024 * 1024
        max_video_duration: int = 300
        supported_formats: List[str] = ["mp4", "avi", "mov", "mkv"]

        model_path: str = "./models"
        temp_dir: str = "./temp"
        output_dir: str = "./output"

        # Job queue. The reference used Celery broker/backend URLs
        # (config.py:29-30); here they select the in-process/multi-process
        # worker backend ("local") or an external queue.
        celery_broker_url: str = "local://"
        celery_result_backend: str = "local://"

        # Worker pool: "thread" (in-process, one TPU owner per process)
        # or "process" (Celery-prefork parity: SIGKILL-able hard time
        # limits + max-tasks-per-child recycling, serve/procworker.py).
        worker_pool: str = "thread"

        # Rate-limit counter store: "memory://" (per-process) or
        # "sqlite:///shared/path.db" (shared across replicas — the
        # reference used Redis for this, app/api/middleware.py:69-116).
        rate_limit_store_url: str = "memory://"

        log_level: str = "INFO"
        enable_metrics: bool = True
        metrics_port: int = 9090

        # Compute (reference config.py:36-39, gpu_enabled -> tpu knobs).
        gpu_enabled: bool = True  # kept for env-file parity; ignored on TPU
        batch_size: int = 32
        confidence_threshold: float = 0.5

        # --- TPU-native runtime knobs (new) ---
        detector_input_size: int = 640
        max_detections_per_frame: int = 64
        recognizer_height: int = 32
        recognizer_width: int = 128
        frame_batch_size: int = 8
        target_sample_fps: float = 10.0
        compute_dtype: str = "bfloat16"
        mesh_data_axis: str = "data"
        mesh_model_axis: str = "model"
        # >0: worker pipelines data-shard each frame batch over this
        # many chips (jax.sharding.Mesh); the k8s-GPU-replica analog
        # collapsed into one process (deployment.yaml:127-189).
        data_parallel_chips: int = 0
        # Non-empty: worker pipelines wrap the hot loop in
        # jax.profiler.trace writing to this directory (SURVEY §5).
        profile_trace_dir: str = ""

        class Config:
            env_file = ".env"
            case_sensitive = False
            extra = "ignore"

else:  # pragma: no cover - plain-object fallback when pydantic is missing

    class Settings:  # type: ignore[no-redef]
        def __init__(self, **kw):
            defaults = dict(
                app_name="Video Text Detection API",
                debug=False,
                version="1.0.0",
                database_url="sqlite:///./vtd.db",
                redis_url="redis://localhost:6379/0",
                secret_key="change-me-in-production",
                algorithm="HS256",
                access_token_expire_minutes=30,
                aws_access_key_id=None,
                aws_secret_access_key=None,
                aws_region="us-east-1",
                s3_bucket_name=None,
                max_file_size=500 * 1024 * 1024,
                max_video_duration=300,
                supported_formats=["mp4", "avi", "mov", "mkv"],
                model_path="./models",
                temp_dir="./temp",
                output_dir="./output",
                celery_broker_url="local://",
                celery_result_backend="local://",
                worker_pool="thread",
                rate_limit_store_url="memory://",
                log_level="INFO",
                enable_metrics=True,
                metrics_port=9090,
                gpu_enabled=True,
                batch_size=32,
                confidence_threshold=0.5,
                detector_input_size=640,
                max_detections_per_frame=64,
                recognizer_height=32,
                recognizer_width=128,
                frame_batch_size=8,
                target_sample_fps=10.0,
                compute_dtype="bfloat16",
                mesh_data_axis="data",
                mesh_model_axis="model",
                data_parallel_chips=0,
                profile_trace_dir="",
            )
            for k, v in defaults.items():
                if k in kw:
                    setattr(self, k, kw[k])
                    continue
                env = os.environ.get(k.upper())
                setattr(self, k, v if env is None else _coerce(env, v))


def _coerce(raw: str, default):
    """Coerce an env string to the default's type (what pydantic
    BaseSettings does on the reference path — this fallback is the
    ACTIVE path when pydantic is absent). Without it MAX_FILE_SIZE=...
    lands as a string and every size/arithmetic comparison 500s, and
    DEBUG=false turns debug ON (non-empty string is truthy)."""
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int) and not isinstance(default, bool):
        try:
            return int(raw)
        except ValueError:
            return default
    if isinstance(default, float):
        try:
            return float(raw)
        except ValueError:
            return default
    if isinstance(default, list):
        return [p.strip() for p in raw.split(",") if p.strip()]
    return raw


settings = Settings()
