"""Checkpoint/resume of partially processed videos."""
import asyncio
import json

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rv") / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240))
    for i in range(60):
        frame = np.full((240, 320, 3), 255, np.uint8)
        cv2.putText(
            frame, "RESUME", (40, 120), cv2.FONT_HERSHEY_SIMPLEX, 1.2, (0, 0, 0), 2
        )
        w.write(frame)
    w.release()
    return path


@pytest.fixture(scope="module")
def pipeline():
    from vtd_tpu.runtime import VideoTextPipeline

    return VideoTextPipeline(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )


def test_resume_skips_done_frames(clip, pipeline, tmp_path):
    resume = str(tmp_path / "ck.jsonl")

    # First run writes the checkpoint.
    r1 = asyncio.run(pipeline.process_video(clip, "", resume_file=resume))
    assert r1["status"] == "success"
    lines = open(resume).read().strip().splitlines()
    assert len(lines) == r1["summary"]["total_frames"]

    # Second run must reuse every frame (no device work) and agree.
    calls = []
    orig = pipeline._dispatch_batch
    pipeline._dispatch_batch = lambda f, **kw: calls.append(1) or orig(f, **kw)
    try:
        r2 = asyncio.run(pipeline.process_video(clip, "", resume_file=resume))
    finally:
        pipeline._dispatch_batch = orig
    assert r2["status"] == "success"
    assert calls == []  # fully resumed
    assert (
        [f["frame_number"] for f in r2["results"]]
        == [f["frame_number"] for f in r1["results"]]
    )


def test_partial_resume(clip, pipeline, tmp_path):
    resume = str(tmp_path / "partial.jsonl")
    r1 = asyncio.run(pipeline.process_video(clip, "", resume_file=resume))
    lines = open(resume).read().strip().splitlines()
    # keep only the first half of the checkpoint (simulate a crash)
    with open(resume, "w") as f:
        f.write("\n".join(lines[: len(lines) // 2]) + "\n")

    calls = []
    orig = pipeline._dispatch_batch
    pipeline._dispatch_batch = lambda fr, **kw: calls.append(1) or orig(fr, **kw)
    try:
        r2 = asyncio.run(pipeline.process_video(clip, "", resume_file=resume))
    finally:
        pipeline._dispatch_batch = orig
    assert r2["status"] == "success"
    assert 0 < len(calls) < 6  # only the un-checkpointed batches ran
    assert r2["summary"]["total_frames"] == r1["summary"]["total_frames"]
