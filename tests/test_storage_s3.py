"""Exercised S3 object-store path via a dict-backed stub boto3 client.

The reference actually runs boto3 (reference
``app/services/storage_service.py:42-58``, ``videos/YYYY/MM/DD/`` key
layout at ``:31-44``); boto3 is absent in this image, so these tests
inject a stub client with the same call surface and cover
store/retrieve/delete/exists/checksum, the key layout, the worker's
``s3://`` pull in ``serve/tasks.py``, and the API's S3 cache fetch.
"""
import asyncio
import hashlib
import os
from datetime import datetime, timezone

import cv2
import numpy as np
import pytest


class FakeS3Client:
    """boto3 S3 client surface backed by a dict."""

    def __init__(self):
        self.objects = {}

    def upload_file(self, src, bucket, key):
        with open(src, "rb") as f:
            self.objects[(bucket, key)] = f.read()

    def download_file(self, bucket, key, dest):
        if (bucket, key) not in self.objects:
            raise FileNotFoundError(f"NoSuchKey: {bucket}/{key}")
        with open(dest, "wb") as f:
            f.write(self.objects[(bucket, key)])

    def delete_object(self, Bucket, Key):
        self.objects.pop((Bucket, Key), None)
        return {}

    def head_object(self, Bucket, Key):
        if (Bucket, Key) not in self.objects:
            raise FileNotFoundError(f"NoSuchKey: {Bucket}/{Key}")
        return {"ContentLength": len(self.objects[(Bucket, Key)])}


@pytest.fixture()
def clip(tmp_path):
    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (64, 48))
    for i in range(12):
        w.write(np.full((48, 64, 3), i * 20 % 255, np.uint8))
    w.release()
    return path


@pytest.fixture()
def s3svc(monkeypatch, tmp_path):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.services.storage_service import StorageService

    monkeypatch.setattr(settings, "s3_bucket_name", "test-bucket")
    fake = FakeS3Client()
    svc = StorageService(base_dir=str(tmp_path / "up"), s3_client=fake)
    return svc, fake


def _md5(path):
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def test_s3_store_key_layout_and_roundtrip(s3svc, clip, tmp_path):
    svc, fake = s3svc
    stored = asyncio.run(svc.store_video(clip, "x.mp4"))
    now = datetime.now(timezone.utc)
    expect_key = f"videos/{now.year:04d}/{now.month:02d}/{now.day:02d}/x.mp4"
    assert stored == f"s3://test-bucket/{expect_key}"
    assert ("test-bucket", expect_key) in fake.objects

    dest = str(tmp_path / "back.mp4")
    got = asyncio.run(svc.retrieve_video(stored, dest))
    assert got == dest
    assert _md5(dest) == _md5(clip)
    assert svc.calculate_checksum(dest) == svc.calculate_checksum(clip)


def test_s3_exists_and_delete(s3svc, clip):
    svc, fake = s3svc
    stored = asyncio.run(svc.store_video(clip, "y.mp4"))
    assert svc.exists(stored)
    assert asyncio.run(svc.delete_video(stored)) is True
    assert not svc.exists(stored)
    assert fake.objects == {}
    # deleting a missing object is idempotent-true (boto3 semantics)
    assert asyncio.run(svc.delete_video(stored)) is True


def test_worker_pulls_s3_video(s3svc, clip, monkeypatch, tmp_path):
    """serve/tasks.py's process_video_task must download an s3:// video
    to a local temp file before decoding, and clean the temp file up."""
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve import tasks as tasks_mod
    from vtd_tpu.serve.db import (
        ProcessingJobCreate,
        ProcessingJobCRUD,
        UserCreate,
        UserCRUD,
        VideoCreate,
        VideoCRUD,
    )
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.queue import TaskContext, TaskRecord

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "temp"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "out"))
    db = Database("sqlite://")
    db.init_db()
    set_database(db)

    svc, fake = s3svc
    stored = asyncio.run(svc.store_video(clip, "worker.mp4"))
    monkeypatch.setattr(tasks_mod, "storage_service", svc)

    user = UserCRUD.create(db, UserCreate(
        email="w@e.fr", username="worker", password="secret123"
    ))
    video = VideoCRUD.create(db, VideoCreate(
        filename="worker.mp4", original_filename="worker.mp4",
        file_path=stored, file_size=os.path.getsize(clip),
    ), owner_id=user["id"])
    job = ProcessingJobCRUD.create(db, ProcessingJobCreate(
        video_id=video["id"], celery_task_id="task-s3-1"
    ))

    seen = {}

    class StubPipeline:
        async def process_video(self, video_path, output_dir, **kw):
            seen["path"] = video_path
            seen["md5"] = _md5(video_path)
            return {
                "status": "success",
                "results": [],
                "summary": {"total_frames": 0, "total_detections": 0},
                "video_info": {"width": 64, "height": 48},
            }

    monkeypatch.setattr(tasks_mod, "get_pipeline", lambda *a, **k: StubPipeline())

    rec = TaskRecord(id="task-s3-1", name="process_video_task",
                     args=(), kwargs={})
    ctx = TaskContext(rec, tasks_mod.task_queue)
    out = tasks_mod.process_video_task.fn(ctx, video["id"], {})

    assert out["status"] == "success"
    # the pipeline received a LOCAL file identical to the S3 object
    assert not seen["path"].startswith("s3://")
    assert seen["md5"] == _md5(clip)
    # temp download cleaned up afterwards
    assert not os.path.exists(seen["path"])
    row = ProcessingJobCRUD.get(db, job["id"])
    assert row["status"] == "completed"


def test_api_s3_cache_fetch(s3svc, clip, monkeypatch, tmp_path):
    """The API's _local_video_path S3 cache: first GET downloads via the
    stub client (atomic rename), second GET serves the cached file."""
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve import app as app_mod
    from vtd_tpu.serve.db.database import Database, set_database
    from vtd_tpu.serve.http import TestClient

    monkeypatch.setattr(settings, "temp_dir", str(tmp_path / "temp"))
    monkeypatch.setattr(settings, "output_dir", str(tmp_path / "out"))
    monkeypatch.setattr(settings, "model_path", str(tmp_path / "models"))
    db = Database("sqlite://")
    db.init_db()
    set_database(db)
    svc, fake = s3svc
    app = app_mod.create_app(start_worker=False, storage_service=svc)
    client = TestClient(app)

    r = client.post("/api/v1/auth/register", json_body={
        "email": "s3@e.fr", "username": "s3user", "password": "secret123",
    })
    token = {"Authorization": f"Bearer {r.json()['access_token']}"}

    from vtd_tpu.serve.db import UserCRUD, VideoCreate, VideoCRUD

    user = UserCRUD.get_by_username(db, "s3user")
    stored = asyncio.run(svc.store_video(clip, "api.mp4"))
    video = VideoCRUD.create(db, VideoCreate(
        filename="api.mp4", original_filename="api.mp4",
        file_path=stored, file_size=os.path.getsize(clip),
    ), owner_id=user["id"])

    r1 = client.get(f"/api/v1/videos/{video['id']}/download", headers=token)
    assert r1.status_code == 200
    assert hashlib.md5(r1.render()).hexdigest() == _md5(clip)
    cached = [
        f for f in os.listdir(settings.temp_dir) if f.startswith("s3cache_")
    ]
    assert len(cached) == 1 and not cached[0].endswith(".dl")
    # second fetch hits the cache (drop the stub's objects to prove it)
    fake.objects.clear()
    r2 = client.get(f"/api/v1/videos/{video['id']}/download", headers=token)
    assert r2.status_code == 200
    assert hashlib.md5(r2.render()).hexdigest() == _md5(clip)
