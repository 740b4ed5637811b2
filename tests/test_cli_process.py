"""`python -m vtd_tpu process` end-to-end smoke test (subprocess).

The CLI is the reference's "run the pipeline from a shell" surface;
this drives it exactly as a user would, on a tiny synthetic clip with
a small detector so the CPU compile stays fast.
"""
import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest


@pytest.fixture()
def clip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (160, 160))
    for _ in range(10):
        frame = np.full((160, 160, 3), 255, np.uint8)
        cv2.putText(frame, "AB", (30, 90), cv2.FONT_HERSHEY_SIMPLEX, 2,
                    (0, 0, 0), 4)
        w.write(frame)
    w.release()
    return path


def test_cli_process_json(clip, tmp_path):
    out = str(tmp_path / "r.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/vtd_jax_test_cache"
    proc = subprocess.run(
        [sys.executable, "-m", "vtd_tpu", "process", clip,
         "--crnn", "--input-size", "160", "--batch-size", "4",
         "--max-dets", "8", "--temporal-dedup", "--out", out],
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True,
        text=True,
        # Cold XLA compile of the fused program on a 1-core CPU host can
        # approach 10 minutes; --max-dets 8 shrinks the program but the
        # budget stays generous so a cache-cold CI host still passes.
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(out) as f:
        result = json.load(f)
    assert result["status"] == "success"
    assert result["summary"]["total_frames"] == 10
    assert "text_tracks" in result["summary"]  # --temporal-dedup
