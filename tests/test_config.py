"""Settings env handling — the pydantic-free fallback path is the
ACTIVE one in this image, so env-string coercion must match what
pydantic BaseSettings would do (reference config.py:5-45)."""
import numpy as np  # noqa: F401  (keeps import style uniform)

from vtd_tpu.core.config import Settings, _coerce


def test_env_coercion_types(monkeypatch):
    monkeypatch.setenv("MAX_FILE_SIZE", "1000000")
    monkeypatch.setenv("TARGET_SAMPLE_FPS", "5.5")
    monkeypatch.setenv("DEBUG", "false")
    monkeypatch.setenv("ENABLE_METRICS", "0")
    monkeypatch.setenv("SUPPORTED_FORMATS", "mp4, avi")
    s = Settings()
    assert s.max_file_size == 1000000 and isinstance(s.max_file_size, int)
    assert s.target_sample_fps == 5.5
    assert s.debug is False
    assert s.enable_metrics is False
    assert s.supported_formats == ["mp4", "avi"]
    # arithmetic that 500'd every upload when these were strings
    assert not (999 > s.max_file_size)


def test_coerce_bad_values_fall_back():
    assert _coerce("not-a-number", 42) == 42
    assert _coerce("nan?", 1.5) == 1.5
    assert _coerce("TRUE", False) is True
    assert _coerce("plain", "x") == "plain"


def test_kwargs_override_env(monkeypatch):
    monkeypatch.setenv("BATCH_SIZE", "4")
    s = Settings(batch_size=16)
    assert s.batch_size == 16
