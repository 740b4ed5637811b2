"""End-to-end worker integration: upload -> detect (real queue + real
small pipeline) -> progress -> results/exports.

Mirrors the reference integration suite (tests/test_integration.py:
real video, real task execution path, result schema + export assertions).
"""
import time

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_worker():
    """Configure the worker singleton pipeline to a small/fast model."""
    from vtd_tpu.serve import tasks

    tasks.configure_pipeline(
        batch_size=4,
        max_dets=16,
        detector_input_size=160,
        rec_chunk=32,
        recognizer_kwargs={"pad_batch": 32},
    )
    yield
    tasks.configure_pipeline()


@pytest.fixture()
def client(tmp_path, monkeypatch, small_worker):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.app import create_app
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.http import TestClient

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "temp"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "out"))
    monkeypatch.setattr(settings, "model_path", str(tmp_path / "models"))
    db = Database("sqlite://")
    db.init_db()
    set_database(db)

    class NoLimit:
        def incr_window(self, key, window_s):
            return 0

    return TestClient(create_app(start_worker=False, rate_limit_store=NoLimit()))


@pytest.fixture()
def uploaded_video(client, tmp_path):
    path = str(tmp_path / "text.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240))
    for i in range(60):
        frame = np.full((240, 320, 3), 255, np.uint8)
        cv2.putText(
            frame, "HELLO", (40, 130), cv2.FONT_HERSHEY_SIMPLEX, 1.5, (0, 0, 0), 3
        )
        w.write(frame)
    w.release()
    with open(path, "rb") as f:
        content = f.read()

    r = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "w@x.com", "username": "worker", "password": "pw",
        },
    )
    headers = {"Authorization": f"Bearer {r.json()['access_token']}"}
    r2 = client.post(
        "/api/v1/videos/upload",
        files={"file": ("text.mp4", content)},
        headers=headers,
    )
    assert r2.status_code == 201, r2.render()
    return client, headers, r2.json()["id"]


def _wait_for_job(client, headers, job_id, timeout=300):
    deadline = time.time() + timeout
    while time.time() < deadline:
        r = client.get(
            f"/api/v1/processing/jobs/{job_id}/status", headers=headers
        )
        status = r.json()["status"]
        if status in ("completed", "failed", "cancelled"):
            return r.json()
        time.sleep(0.5)
    raise TimeoutError("job did not finish")


def test_full_processing_workflow(uploaded_video):
    client, headers, vid = uploaded_video

    r = client.post(
        f"/api/v1/processing/videos/{vid}/detect",
        params={"use_transformer": "false", "confidence_threshold": 0.5},
        headers=headers,
    )
    assert r.status_code == 200, r.render()
    job = r.json()

    final = _wait_for_job(client, headers, job["id"])
    assert final["status"] == "completed", final
    assert final["progress"] == 100.0
    assert final["processed_frames"] > 0

    # JSON results
    r2 = client.get(
        f"/api/v1/processing/videos/{vid}/results", headers=headers
    )
    assert r2.status_code == 200
    data = r2.json()["results"]
    assert data["status"] == "success"
    assert data["summary"]["total_frames"] == final["processed_frames"]

    # CSV + XML exports well-formed
    csv_r = client.get(
        f"/api/v1/processing/videos/{vid}/results",
        params={"format": "csv"}, headers=headers,
    )
    assert csv_r.json()["content"].startswith("frame_number,timestamp")

    xml_r = client.get(
        f"/api/v1/processing/videos/{vid}/results",
        params={"format": "xml"}, headers=headers,
    )
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_r.json()["content"])
    assert root.tag == "video_text_detection"
    assert root.find("frames") is not None

    # frames + detections persisted
    r3 = client.get(
        f"/api/v1/videos/{vid}",
        params={"include_detections": "true"}, headers=headers,
    )
    body = r3.json()
    assert len(body["frames"]) == final["processed_frames"]

    # annotated video renders
    r4 = client.get(
        f"/api/v1/processing/videos/{vid}/annotated", headers=headers
    )
    assert r4.status_code == 200
    assert r4.render()[:8] != b""


def test_failed_job_path(uploaded_video):
    """Deleting the file under a job -> failed status with error."""
    client, headers, vid = uploaded_video
    import os

    from vtd_tpu.serve.db import VideoCRUD
    from vtd_tpu.serve.db.database import get_database

    video = VideoCRUD.get(get_database(), vid)
    os.remove(video["file_path"])

    r = client.post(
        f"/api/v1/processing/videos/{vid}/detect",
        params={"use_transformer": "false"},
        headers=headers,
    )
    job = r.json()
    final = _wait_for_job(client, headers, job["id"])
    assert final["status"] == "failed"
    assert final["error_message"]
