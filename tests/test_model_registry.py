"""Model-version registry wired into serving.

The reference defines the ``model_versions`` table and CRUD but nothing
ever reads them (reference ``app/database/models.py:122-136``,
``crud.py:135-158``). vtd_tpu wires the registry: admin endpoints manage
rows, the ACTIVE row per model_type decides which checkpoint a worker
pipeline loads, and each job records the versions that served it.
"""
import asyncio
import os

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
    r = client.post("/api/v1/auth/register", json_body={
        "email": "mv@e.fr", "username": "mvuser", "password": "secret123",
    })
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


def _register(client, headers, name, version, path, active=False):
    r = client.post("/api/v1/models", json_body={
        "name": name, "version": version, "model_type": "detector",
        "file_path": path, "is_active": active,
    }, headers=headers)
    assert r.status_code == 201, r.render()
    return r.json()


def test_registry_endpoints_lifecycle(client, auth_headers, tmp_path):
    p1, p2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    v1 = _register(client, auth_headers, "dbnet", "1.0.0", p1)
    v2 = _register(client, auth_headers, "dbnet", "1.1.0", p2)

    r = client.get("/api/v1/models", params={"model_type": "detector"},
                   headers=auth_headers)
    assert r.status_code == 200
    assert {row["version"] for row in r.json()} == {"1.0.0", "1.1.0"}

    r = client.post(f"/api/v1/models/{v2['id']}/activate",
                    headers=auth_headers)
    assert r.status_code == 200
    assert r.json()["is_active"] in (True, 1)

    # activation is exclusive per model_type
    r = client.post(f"/api/v1/models/{v1['id']}/activate",
                    headers=auth_headers)
    assert r.status_code == 200
    rows = client.get("/api/v1/models", headers=auth_headers).json()
    actives = [row for row in rows if row["is_active"]]
    assert len(actives) == 1 and actives[0]["id"] == v1["id"]

    r = client.post("/api/v1/models/99999/activate", headers=auth_headers)
    assert r.status_code == 404
    # unauthenticated access rejected
    assert client.get("/api/v1/models").status_code == 401


def test_get_pipeline_follows_active_version(tmp_path, monkeypatch):
    """Flipping the active registry row changes which checkpoint the
    worker pipeline is constructed with — no worker restart."""
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve import tasks as tasks_mod
    from vtd_tpu.serve.db import ModelVersionCreate, ModelVersionCRUD
    from vtd_tpu.serve.db.database import Database, set_database

    monkeypatch.setattr(settings, "model_path", str(tmp_path / "none"))
    db = Database("sqlite://")
    db.init_db()
    set_database(db)

    built = []

    class StubPipeline:
        def __init__(self, **kwargs):
            self.kwargs = kwargs
            built.append(kwargs)

    monkeypatch.setattr(
        "vtd_tpu.runtime.pipeline.VideoTextPipeline", StubPipeline
    )
    tasks_mod.configure_pipeline()  # clear caches

    ck1, ck2 = str(tmp_path / "det_v1"), str(tmp_path / "det_v2")
    os.makedirs(ck1)
    os.makedirs(ck2)
    v1 = ModelVersionCRUD.create(db, ModelVersionCreate(
        name="dbnet", version="1.0.0", model_type="detector", file_path=ck1,
    ))
    v2 = ModelVersionCRUD.create(db, ModelVersionCreate(
        name="dbnet", version="2.0.0", model_type="detector", file_path=ck2,
    ))

    # no active row -> no detector_path injected
    p0 = tasks_mod.get_pipeline(False)
    assert "detector_path" not in p0.kwargs
    assert p0.model_versions == {}

    ModelVersionCRUD.set_active(db, v1["id"])
    p1 = tasks_mod.get_pipeline(False)
    assert p1.kwargs["detector_path"] == ck1
    assert p1.model_versions["detector"]["version"] == "1.0.0"

    # same active version -> cached pipeline object
    assert tasks_mod.get_pipeline(False) is p1

    ModelVersionCRUD.set_active(db, v2["id"])
    p2 = tasks_mod.get_pipeline(False)
    assert p2 is not p1
    assert p2.kwargs["detector_path"] == ck2
    assert p2.model_versions["detector"]["version"] == "2.0.0"

    # a dangling file_path falls back to standard resolution
    v3 = ModelVersionCRUD.create(db, ModelVersionCreate(
        name="dbnet", version="3.0.0", model_type="detector",
        file_path=str(tmp_path / "missing"),
    ))
    ModelVersionCRUD.set_active(db, v3["id"])
    p3 = tasks_mod.get_pipeline(False)
    assert "detector_path" not in p3.kwargs
    tasks_mod.configure_pipeline()


def test_job_records_model_versions(tmp_path, monkeypatch):
    """A completed job's result_data and its detection rows carry the
    registry identity of the models that served it."""
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve import tasks as tasks_mod
    from vtd_tpu.serve.db import (
        ProcessingJobCreate, ProcessingJobCRUD, UserCreate, UserCRUD,
        VideoCreate, VideoCRUD,
    )
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.queue import TaskContext, TaskRecord

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "temp"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "out"))
    db = Database("sqlite://")
    db.init_db()
    set_database(db)

    clip = str(tmp_path / "c.mp4")
    import cv2
    import numpy as np

    w = cv2.VideoWriter(clip, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    for _ in range(6):
        w.write(np.zeros((48, 64, 3), np.uint8))
    w.release()

    user = UserCRUD.create(db, UserCreate(
        email="j@e.fr", username="jobuser", password="secret123"
    ))
    video = VideoCRUD.create(db, VideoCreate(
        filename="c.mp4", original_filename="c.mp4",
        file_path=clip, file_size=os.path.getsize(clip),
    ), owner_id=user["id"])
    job = ProcessingJobCRUD.create(db, ProcessingJobCreate(
        video_id=video["id"], celery_task_id="task-mv-1"
    ))

    class StubPipeline:
        model_versions = {
            "detector": {"id": 7, "name": "dbnet-tpu", "version": "2.1.0"},
        }

        async def process_video(self, video_path, output_dir, **kw):
            return {
                "status": "success",
                "results": [{
                    "frame_number": 0, "timestamp": 0.0,
                    "detections": [{
                        "text": "X", "detection_confidence": 0.9,
                        "bbox": [1, 2, 3, 4],
                    }],
                }],
                "summary": {"total_frames": 1, "total_detections": 1},
                "video_info": {"width": 64, "height": 48},
            }

    monkeypatch.setattr(
        tasks_mod, "get_pipeline", lambda *a, **k: StubPipeline()
    )
    rec = TaskRecord(id="task-mv-1", name="process_video_task",
                     args=(), kwargs={})
    out = tasks_mod.process_video_task.fn(
        TaskContext(rec, tasks_mod.task_queue), video["id"], {}
    )
    assert out["status"] == "success"

    row = ProcessingJobCRUD.get(db, job["id"])
    assert row["status"] == "completed"
    assert row["result_data"]["model_versions"]["detector"]["version"] == "2.1.0"
    dets = db.query_all("SELECT * FROM text_detections")
    assert len(dets) == 1
    assert dets[0]["model_name"] == "dbnet-tpu"
    assert dets[0]["model_version"] == "2.1.0"
