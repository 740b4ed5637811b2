"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's "fake backend" test strategy (SQLite instead of
Postgres, patched Celery — reference ``tests/test_api.py:15-32``): here
the fake backend for TPU hardware is
``--xla_force_host_platform_device_count=8`` on CPU, so sharding and
collectives are exercised without real chips.
"""
import os

# The XLA_FLAGS env must be set before the CPU backend initializes.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# sitecustomize (in /root/.axon_site) imports jax and registers the TPU
# backend before pytest starts, so the env var alone is too late —
# override the platform on the already-imported module.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the heavy DBNet/CRNN CPU compiles dominate
# test wall-time; cache them across test sessions.
jax.config.update("jax_compilation_cache_dir", "/tmp/vtd_jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def sample_image(rng):
    """Random noise BGR frame (reference tests/test_models.py:11-13)."""
    return rng.integers(0, 255, size=(480, 640, 3), dtype=np.uint8)


@pytest.fixture
def text_image():
    """Synthetic frame with burned-in text (test_models.py:15-19)."""
    import cv2

    img = np.full((480, 640, 3), 255, dtype=np.uint8)
    cv2.putText(
        img, "TEST TEXT", (100, 240), cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 0, 0), 3
    )
    return img
