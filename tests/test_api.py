"""API tests — fake-backend strategy parity with reference
tests/test_api.py: in-memory sqlite, task dispatch patched, TestClient.
"""
import json
from unittest.mock import patch

import cv2
import numpy as np
import pytest


@pytest.fixture()
def client(tmp_path, monkeypatch):
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
    app = create_app(start_worker=False)
    return TestClient(app)


@pytest.fixture()
def auth_headers(client):
    r = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "test@example.com",
            "username": "testuser",
            "password": "secret123",
        },
    )
    assert r.status_code == 201, r.render()
    token = r.json()["access_token"]
    return {"Authorization": f"Bearer {token}"}


def _real_video_bytes(tmp_path) -> bytes:
    path = str(tmp_path / "real.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    for _ in range(30):
        w.write(np.zeros((48, 64, 3), np.uint8))
    w.release()
    with open(path, "rb") as f:
        return f.read()


# ------------------------- root / health -------------------------------
def test_root(client):
    r = client.get("/")
    assert r.status_code == 200
    body = r.json()
    assert body["status"] == "healthy"
    assert "version" in body


def test_health(client):
    r = client.get("/health")
    assert r.status_code == 200
    assert r.json()["database"]["status"] == "healthy"


def test_metrics_endpoint(client):
    r = client.get("/metrics")
    assert r.status_code == 200
    assert b"http_requests_total" in r.render() or len(r.render()) > 0


# ------------------------- auth ----------------------------------------
def test_register_login_me_flow(client):
    r = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "a@b.com", "username": "alice", "password": "pw123456",
        },
    )
    assert r.status_code == 201
    assert r.json()["token_type"] == "bearer"

    # duplicate email
    r2 = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "a@b.com", "username": "alice2", "password": "x",
        },
    )
    assert r2.status_code == 400
    assert "Email already registered" in r2.json()["detail"]

    # duplicate username
    r3 = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "c@d.com", "username": "alice", "password": "x",
        },
    )
    assert r3.status_code == 400

    # login (OAuth2 form)
    r4 = client.post(
        "/api/v1/auth/login",
        data={"username": "alice", "password": "pw123456"},
    )
    assert r4.status_code == 200
    token = r4.json()["access_token"]

    # wrong password
    r5 = client.post(
        "/api/v1/auth/login", data={"username": "alice", "password": "nope"}
    )
    assert r5.status_code == 401

    # me
    r6 = client.get(
        "/api/v1/auth/me", headers={"Authorization": f"Bearer {token}"}
    )
    assert r6.status_code == 200
    body = r6.json()
    assert body["username"] == "alice"
    assert "hashed_password" not in body

    # refresh
    r7 = client.post(
        "/api/v1/auth/refresh", headers={"Authorization": f"Bearer {token}"}
    )
    assert r7.status_code == 200


def test_auth_invalid_token(client):
    r = client.get(
        "/api/v1/auth/me", headers={"Authorization": "Bearer bogus.token.sig"}
    )
    assert r.status_code == 401
    r2 = client.get("/api/v1/auth/me")
    assert r2.status_code == 401


def test_invalid_email_rejected(client):
    r = client.post(
        "/api/v1/auth/register",
        json_body={"email": "notanemail", "username": "u1", "password": "p"},
    )
    assert r.status_code == 422


# ------------------------- videos --------------------------------------
def test_upload_requires_auth(client):
    r = client.post(
        "/api/v1/videos/upload", files={"file": ("v.mp4", b"data")}
    )
    assert r.status_code == 401


def test_upload_validates_extension(client, auth_headers):
    r = client.post(
        "/api/v1/videos/upload",
        files={"file": ("malware.exe", b"MZ")},
        headers=auth_headers,
    )
    assert r.status_code == 400
    assert "Unsupported file format" in r.json()["detail"]


def test_upload_and_list_and_get(client, auth_headers, tmp_path):
    content = _real_video_bytes(tmp_path)
    r = client.post(
        "/api/v1/videos/upload",
        files={"file": ("clip.mp4", content)},
        headers=auth_headers,
    )
    assert r.status_code == 201, r.render()
    video = r.json()
    assert video["original_filename"] == "clip.mp4"
    assert video["file_size"] == len(content)
    assert video["width"] == 64 and video["height"] == 48

    r2 = client.get("/api/v1/videos/", headers=auth_headers)
    assert r2.status_code == 200
    assert len(r2.json()) == 1

    vid = video["id"]
    r3 = client.get(f"/api/v1/videos/{vid}", headers=auth_headers)
    assert r3.status_code == 200

    # update
    r4 = client.put(
        f"/api/v1/videos/{vid}",
        json_body={"category": "sports"},
        headers=auth_headers,
    )
    assert r4.status_code == 200
    assert r4.json()["category"] == "sports"

    # download
    r5 = client.get(f"/api/v1/videos/{vid}/download", headers=auth_headers)
    assert r5.status_code == 200
    assert r5.render() == content

    # thumbnail
    r6 = client.get(f"/api/v1/videos/{vid}/thumbnail", headers=auth_headers)
    assert r6.status_code == 200
    assert r6.media_type == "image/jpeg"

    # delete
    r7 = client.delete(f"/api/v1/videos/{vid}", headers=auth_headers)
    assert r7.status_code == 204
    r8 = client.get(f"/api/v1/videos/{vid}", headers=auth_headers)
    assert r8.status_code == 404


def test_video_ownership_enforced(client, auth_headers, tmp_path):
    content = _real_video_bytes(tmp_path)
    r = client.post(
        "/api/v1/videos/upload",
        files={"file": ("clip.mp4", content)},
        headers=auth_headers,
    )
    vid = r.json()["id"]

    r2 = client.post(
        "/api/v1/auth/register",
        json_body={
            "email": "other@x.com", "username": "other", "password": "pw",
        },
    )
    other = {"Authorization": f"Bearer {r2.json()['access_token']}"}
    r3 = client.get(f"/api/v1/videos/{vid}", headers=other)
    assert r3.status_code == 403


# ------------------------- processing -----------------------------------
def test_start_detection_dispatches_task(client, auth_headers, tmp_path):
    content = _real_video_bytes(tmp_path)
    r = client.post(
        "/api/v1/videos/upload",
        files={"file": ("clip.mp4", content)},
        headers=auth_headers,
    )
    vid = r.json()["id"]

    with patch(
        "vtd_tpu.serve.app.process_video_task"
    ) as mock_task:
        r2 = client.post(
            f"/api/v1/processing/videos/{vid}/detect",
            params={"confidence_threshold": 0.7, "use_transformer": "false"},
            headers=auth_headers,
        )
        assert r2.status_code == 200, r2.render()
        job = r2.json()
        assert job["status"] == "pending"
        # The app PRE-generates the task id and persists the job row
        # BEFORE submission (apply_async(task_id=...)) so a fast worker
        # can't race the insert; the dispatched id must match the row.
        call = mock_task.apply_async.call_args
        assert call.kwargs["task_id"] == job["celery_task_id"]
        cfg = call.kwargs["args"][1]
        assert cfg["confidence_threshold"] == 0.7
        assert cfg["use_transformer"] is False

        # duplicate-job guard (409)
        r3 = client.post(
            f"/api/v1/processing/videos/{vid}/detect", headers=auth_headers
        )
        assert r3.status_code == 409

    # job status endpoint merges DB + task state
    r4 = client.get(
        f"/api/v1/processing/jobs/{job['id']}/status", headers=auth_headers
    )
    assert r4.status_code == 200
    body = r4.json()
    assert body["job_id"] == job["id"]
    assert body["status"] == "pending"

    # cancel
    r5 = client.post(
        f"/api/v1/processing/jobs/{job['id']}/cancel", headers=auth_headers
    )
    assert r5.status_code in (200, 500)  # queue has no such task id -> 500

    # results: none completed yet
    r6 = client.get(
        f"/api/v1/processing/videos/{vid}/results", headers=auth_headers
    )
    assert r6.status_code == 404


def test_results_formats(client, auth_headers, tmp_path):
    from vtd_tpu.serve.db import (
        ProcessingJobCreate, ProcessingJobCRUD, ProcessingJobUpdate,
    )
    from vtd_tpu.serve.db.database import get_database

    content = _real_video_bytes(tmp_path)
    r = client.post(
        "/api/v1/videos/upload",
        files={"file": ("clip.mp4", content)},
        headers=auth_headers,
    )
    vid = r.json()["id"]

    result_data = {
        "results": [
            {
                "frame_number": 0,
                "timestamp": 0.0,
                "detections": [
                    {
                        "bbox": [1, 2, 30, 40],
                        "text": "HELLO",
                        "detection_confidence": 0.9,
                        "recognition_confidence": 0.8,
                        "polygon": [[1, 2], [30, 2], [30, 40], [1, 40]],
                    }
                ],
            }
        ],
        "summary": {"total_detections": 1, "unique_texts": 1},
    }
    db = get_database()
    job = ProcessingJobCRUD.create(
        db, ProcessingJobCreate(video_id=vid, celery_task_id="t-done")
    )
    ProcessingJobCRUD.update(
        db, job["id"],
        ProcessingJobUpdate(status="completed", result_data=result_data),
    )

    r1 = client.get(
        f"/api/v1/processing/videos/{vid}/results", headers=auth_headers
    )
    assert r1.status_code == 200
    assert r1.json()["results"]["summary"]["total_detections"] == 1

    r2 = client.get(
        f"/api/v1/processing/videos/{vid}/results",
        params={"format": "csv"},
        headers=auth_headers,
    )
    csv_content = r2.json()["content"]
    assert csv_content.splitlines()[0] == (
        "frame_number,timestamp,text,bbox_x1,bbox_y1,bbox_x2,bbox_y2,"
        "detection_confidence,recognition_confidence"
    )
    assert "HELLO" in csv_content

    r3 = client.get(
        f"/api/v1/processing/videos/{vid}/results",
        params={"format": "xml"},
        headers=auth_headers,
    )
    xml = r3.json()["content"]
    assert xml.startswith("<video_text_detection>")
    assert 'transcription="HELLO"' in xml
    assert xml.count("<Point") == 4


# ------------------------- middleware ------------------------------------
def test_rate_limit_auth_endpoints(client):
    codes = []
    for i in range(15):
        r = client.post(
            "/api/v1/auth/login", data={"username": "x", "password": "y"}
        )
        codes.append(r.status_code)
    assert 429 in codes
    assert codes[0] == 401  # first ones hit the handler


def test_security_and_cors_headers(client):
    r = client.get("/")
    assert r.headers["X-Content-Type-Options"] == "nosniff"
    assert r.headers["X-Frame-Options"] == "DENY"
    assert r.headers["Access-Control-Allow-Origin"] == "*"
    assert "X-Process-Time" in r.headers


def test_error_responses_are_middleware_decorated(client):
    """4xx responses must flow through the middleware onion: CORS +
    security headers and X-Process-Time on errors too (FastAPI runs
    exception handlers inside the middleware stack; a 401 without
    Access-Control-Allow-Origin shows up in browsers as an opaque CORS
    failure instead of an auth error)."""
    r = client.get("/api/v1/auth/me")  # no token -> 401
    assert r.status_code == 401
    assert r.headers["Access-Control-Allow-Origin"] == "*"
    assert r.headers["X-Content-Type-Options"] == "nosniff"
    assert "X-Process-Time" in r.headers
    r2 = client.get("/api/v1/does-not-exist")
    assert r2.status_code == 404
    assert r2.headers["Access-Control-Allow-Origin"] == "*"


def test_schema_migrations_applied(client):
    from vtd_tpu.serve.db.database import get_database
    from vtd_tpu.serve.db.migrations import MIGRATIONS, current_version

    db = get_database()
    assert current_version(db) == MIGRATIONS[-1][0]
    # idempotent
    db.init_db()
    assert current_version(db) == MIGRATIONS[-1][0]


def test_404_and_error_shape(client):
    r = client.get("/api/v1/nonexistent")
    assert r.status_code == 404
    body = r.json()
    assert body["detail"] == "Not found"
    assert body["path"] == "/api/v1/nonexistent"
