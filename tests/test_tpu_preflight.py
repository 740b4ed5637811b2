"""Outage-robustness of the driver entry points.

Round-3 post-mortem: a dead TPU relay hung ``jax.devices()`` in
``dryrun_multichip`` (MULTICHIP_r03 rc=124) and crashed ``bench.py``
with an unparseable traceback (BENCH_r03 rc=1/parsed=null). These tests
pin the preflight layer that prevents both.
"""
import json
import os
import socket
import subprocess
import sys

from vtd_tpu.core import tpu_preflight as pf


def _closed_port() -> int:
    """A localhost port that is guaranteed closed right now."""
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_relay_in_play_respects_cpu_pin(monkeypatch):
    monkeypatch.setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert not pf._relay_in_play()
    # the image default: JAX_PLATFORMS=axon for every process
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert pf._relay_in_play()
    monkeypatch.delenv("JAX_PLATFORMS")
    assert pf._relay_in_play()
    monkeypatch.delenv("AXON_POOL_SVC_OVERRIDE")
    assert not pf._relay_in_play()


def test_bounded_device_count_dead_relay_fast(monkeypatch):
    """Dead relay listener -> 0 in milliseconds, no subprocess."""
    monkeypatch.setenv("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setattr(pf, "_RELAY_PORT", _closed_port())
    import time

    t0 = time.time()
    assert pf.bounded_device_count() == 0
    assert time.time() - t0 < 2.0


def test_bounded_device_count_honors_cpu_pin(monkeypatch):
    """With a cpu pin the count comes from the virtual CPU mesh (the
    conftest exports --xla_force_host_platform_device_count=8)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert pf.bounded_device_count(deadline=120.0) == 8


def test_ensure_reachable_backend_honors_local_pin(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert pf.ensure_reachable_backend() is True


def test_unreachable_error_classifier():
    assert pf.is_backend_unreachable_error(
        RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: TPU "
            "backend setup/compile error (Unavailable)."
        )
    )
    assert pf.is_backend_unreachable_error(
        ConnectionError("Connection refused")
    )
    assert not pf.is_backend_unreachable_error(ValueError("bad shape"))


def test_bench_emits_structured_failure_line(monkeypatch, capsys):
    import bench

    bench._emit_failure("e2e_720p_ocr_frames_per_sec_per_chip",
                        "tpu_unreachable", "detail " * 400)
    line = capsys.readouterr().out.strip()
    parsed = json.loads(line)
    assert parsed["metric"] == "e2e_720p_ocr_frames_per_sec_per_chip"
    assert parsed["error"] == "tpu_unreachable"
    assert parsed["value"] == 0.0
    assert len(parsed["detail"]) <= 800


def test_bench_outer_shell_dead_relay(monkeypatch):
    """End-to-end: `python bench.py` against a dead relay prints ONE
    parseable JSON line and exits 0 within seconds."""
    port = _closed_port()
    env = dict(
        os.environ,
        AXON_POOL_SVC_OVERRIDE="127.0.0.1",
        JAX_PLATFORMS="axon",
        VTD_TPU_RELAY_PORT=str(port),
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, timeout=60, env=env, cwd=repo,
    )
    assert proc.returncode == 0, proc.stderr[-500:]
    parsed = json.loads(proc.stdout.strip().splitlines()[-1])
    assert parsed["error"] == "tpu_unreachable"
