"""Service-layer tests: VideoService, StorageService, ProcessingService."""
import asyncio
import hashlib
import os
import time

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("svc") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (160, 120))
    for i in range(30):
        w.write(np.full((120, 160, 3), i * 8 % 255, np.uint8))
    w.release()
    return path


def test_video_service_metadata_and_thumbnail(clip, tmp_path, monkeypatch):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.services.video_service import VideoService

    monkeypatch.setattr(settings, "output_dir", str(tmp_path))
    svc = VideoService()
    meta = asyncio.run(svc.get_video_metadata(clip))
    assert meta["width"] == 160 and meta["height"] == 120

    thumb = asyncio.run(svc.generate_thumbnail(clip, timestamp=0.5))
    assert thumb and os.path.exists(thumb)
    img = cv2.imread(thumb)
    assert img.shape == (240, 320, 3)  # 320x240 JPEG (video_service parity)


def test_video_service_validation(clip):
    from vtd_tpu.serve.services.video_service import VideoService

    svc = VideoService()
    ok = asyncio.run(svc.validate_video(clip))
    assert ok["valid"] is True
    assert ok["errors"] == []

    missing = asyncio.run(svc.validate_video("/nonexistent.mp4"))
    assert missing["valid"] is False
    assert "File does not exist" in missing["errors"]


def test_storage_service_roundtrip(clip, tmp_path):
    from vtd_tpu.serve.services.storage_service import StorageService

    svc = StorageService(base_dir=str(tmp_path / "uploads"))
    stored = asyncio.run(svc.store_video(clip, "x.mp4"))
    assert os.path.exists(stored)
    assert svc.exists(stored)
    # date-bucketed path (storage_service parity)
    rel = os.path.relpath(stored, str(tmp_path / "uploads"))
    parts = rel.split(os.sep)
    assert len(parts) == 4 and parts[0].isdigit()

    out = str(tmp_path / "copy.mp4")
    asyncio.run(svc.retrieve_video(stored, out))
    assert (
        StorageService.calculate_checksum(out)
        == StorageService.calculate_checksum(clip)
        == hashlib.md5(open(clip, "rb").read()).hexdigest()
    )

    assert asyncio.run(svc.delete_video(stored))
    assert not svc.exists(stored)


def test_storage_temp_cleanup(tmp_path):
    from vtd_tpu.serve.services.storage_service import StorageService

    old = tmp_path / "old.bin"
    new = tmp_path / "new.bin"
    old.write_bytes(b"x")
    new.write_bytes(b"y")
    past = time.time() - 48 * 3600
    os.utime(old, (past, past))
    removed = StorageService.cleanup_temp_files(str(tmp_path), max_age_hours=24)
    assert removed == 1
    assert new.exists() and not old.exists()


def test_annotated_video_renders(clip, tmp_path, monkeypatch):
    from vtd_tpu.core.config import settings
    from vtd_tpu.serve.services.processing_service import ProcessingService

    monkeypatch.setattr(settings, "output_dir", str(tmp_path))
    svc = ProcessingService()
    results = {
        "results": [
            {
                "frame_number": 0,
                "timestamp": 0.0,
                "detections": [
                    {
                        "bbox": [10, 10, 100, 50],
                        "text": "HI",
                        "detection_confidence": 0.9,
                        "recognition_confidence": 0.8,
                    }
                ],
            }
        ]
    }
    out = asyncio.run(svc.create_annotated_video(clip, results))
    assert out and os.path.exists(out)
    cap = cv2.VideoCapture(out)
    ok, frame = cap.read()
    cap.release()
    assert ok
    # green rectangle drawn on frame 0
    assert (frame[10:50, 10:100, 1] > 200).any()
