"""Keyframe sampling and parallel segmented decode.

The reference samples every stride candidate (preprocessing.py:43-72)
and has no scene-change logic; keyframe mode + propagation and
multi-worker segment decode are TPU-rebuild additions (SURVEY §7 "host-
side video decode bandwidth" / VERDICT round-1 item 6).
"""
import asyncio

import cv2
import numpy as np
import pytest


@pytest.fixture(scope="module")
def scene_video(tmp_path_factory):
    """6-second 320x240 @ 30fps clip with a hard scene change at 3s:
    first half says SCENE ONE on white, second half SCENE TWO on gray.
    """
    path = str(tmp_path_factory.mktemp("vid") / "scenes.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240)
    )
    for i in range(180):
        if i < 90:
            frame = np.full((240, 320, 3), 255, np.uint8)
            cv2.putText(frame, "SCENE ONE", (30, 120),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 0), 2)
        else:
            frame = np.full((240, 320, 3), 120, np.uint8)
            cv2.putText(frame, "SCENE TWO", (30, 120),
                        cv2.FONT_HERSHEY_SIMPLEX, 0.8, (255, 255, 255), 2)
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture(scope="module")
def small_pipeline():
    from vtd_tpu.runtime import VideoTextPipeline

    return VideoTextPipeline(
        use_transformer_ocr=False,
        batch_size=4,
        max_dets=16,
        detector_input_size=160,
        rec_chunk=32,
        recognizer_kwargs={"pad_batch": 32},
    )


def _collect(batches):
    kf, dups = [], []
    for b in batches:
        if b.get("frames") is not None:
            n = int(b["valid"].sum())
            kf.extend(int(x) for x in b["frame_numbers"][:n])
        for fn, ts, ref in b.get("dups") or []:
            dups.append((int(fn), int(ref)))
    return kf, dups


def test_keyframe_mode_covers_all_candidates(scene_video):
    from vtd_tpu.video import VideoProcessor

    vp = VideoProcessor()
    serial = [
        idx for _, idx, _ in vp.extract_frames_at_fps(scene_video, 10.0)
    ]
    kf, dups = _collect(
        vp.extract_frame_batches(
            scene_video, batch_size=4, target_fps=10.0,
            sample_mode="keyframe", keyframe_max_gap=1000,
        )
    )
    # every stride candidate is either a keyframe or a dup of one
    assert sorted(kf + [fn for fn, _ in dups]) == serial
    # static halves collapse: far fewer keyframes than candidates,
    # but at least 2 (one per scene)
    assert 2 <= len(kf) < len(serial) / 2
    # every dup's reference keyframe was actually emitted
    assert all(ref in kf for _, ref in dups)
    # the scene change at candidate 30 (frame 90 / stride 3) forces a
    # keyframe at or just after it
    assert any(28 <= k <= 32 for k in kf[1:])


def test_keyframe_max_gap_forces_refresh(scene_video):
    from vtd_tpu.video import VideoProcessor

    kf, _ = _collect(
        VideoProcessor().extract_frame_batches(
            scene_video, batch_size=4, target_fps=10.0,
            sample_mode="keyframe", keyframe_max_gap=5,
        )
    )
    # 60 candidates, at most 5 dups per keyframe -> keyframes every
    # 6th candidate -> >= 10 keyframes
    assert len(kf) >= 10
    gaps = np.diff(sorted(kf))
    assert gaps.max() <= 6


def test_parallel_decode_matches_serial(scene_video):
    from vtd_tpu.video import VideoProcessor

    vp = VideoProcessor()
    serial = [
        (idx, round(ts, 4))
        for _, idx, ts in vp.extract_frames_at_fps(scene_video, 10.0)
    ]
    got = []
    for b in vp.extract_frame_batches(
        scene_video, batch_size=4, target_fps=10.0, decode_workers=3
    ):
        n = int(b["valid"].sum())
        for i in range(n):
            got.append(
                (int(b["frame_numbers"][i]), round(float(b["timestamps"][i]), 4))
            )
    assert sorted(got) == serial


def test_parallel_decode_frames_identical(scene_video):
    """Seek-based segment decode must produce the same pixels."""
    from vtd_tpu.video import VideoProcessor

    vp = VideoProcessor()
    ref = {
        idx: frame
        for frame, idx, _ in vp.extract_frames_at_fps(scene_video, 10.0)
    }
    for b in vp.extract_frame_batches(
        scene_video, batch_size=4, target_fps=10.0, decode_workers=2
    ):
        n = int(b["valid"].sum())
        for i in range(n):
            fn = int(b["frame_numbers"][i])
            assert np.array_equal(b["frames"][i], ref[fn]), fn


def test_pipeline_keyframe_propagation(scene_video, small_pipeline):
    result = asyncio.run(
        small_pipeline.process_video(scene_video, sample_mode="keyframe")
    )
    assert result["status"] == "success"
    recs = result["results"]
    # all 60 candidates covered, frame-ordered
    fns = [r["frame_number"] for r in recs]
    assert fns == sorted(fns)
    assert len(recs) == 60
    dups = [r for r in recs if "duplicate_of" in r]
    kfs = {r["frame_number"]: r for r in recs if "duplicate_of" not in r}
    assert dups and len(kfs) < 30
    by_fn = {r["frame_number"]: r for r in recs}
    for d in dups:
        ref = by_fn[d["duplicate_of"]]
        assert "duplicate_of" not in ref
        assert [x["text"] for x in d["detections"]] == [
            x["text"] for x in ref["detections"]
        ]
    assert result["summary"]["total_frames"] == 60


def test_pipeline_stride_mode_unchanged(scene_video, small_pipeline):
    result = asyncio.run(small_pipeline.process_video(scene_video))
    assert result["status"] == "success"
    assert all("duplicate_of" not in r for r in result["results"])
    assert len(result["results"]) == 60


def test_native_and_cv2_keyframe_gates_agree(scene_video):
    """The in-decoder native gate (vtd_vd_read_batch_kf) and the cv2
    host gate must make equivalent scene-change decisions: identical
    full coverage, dup references pointing at emitted keyframes, and a
    keyframe at the hard scene boundary for both."""
    from vtd_tpu.video import VideoProcessor

    vp = VideoProcessor()
    out = {}
    for backend in ("native", "cv2"):
        kf, dups = _collect(
            vp.extract_frame_batches(
                scene_video, batch_size=4, target_fps=10.0,
                sample_mode="keyframe", keyframe_max_gap=1000,
                decode_backend=backend,
            )
        )
        out[backend] = (kf, dups)
        covered = sorted(kf + [fn for fn, _ in dups])
        assert covered == list(range(60)), backend
        assert all(ref in kf for _, ref in dups), backend
        assert any(28 <= k <= 32 for k in kf[1:]), backend
    # both gates collapse the static halves to a handful of keyframes
    n_native = len(out["native"][0])
    n_cv2 = len(out["cv2"][0])
    assert n_native <= 6 and n_cv2 <= 6, (n_native, n_cv2)


def test_native_kf_gate_segment_seek_resets_state(scene_video):
    """Parallel segment decode opens/seeks per segment; the native gate
    state must reset so a segment's first candidate is always a
    keyframe (a stale signature would classify it as a duplicate of a
    frame the segment never emitted)."""
    from vtd_tpu.native import video as nv

    r = nv.open_video(scene_video, (320, 240), "yuv420")
    if r is None:
        import pytest

        pytest.skip("native decoder unavailable")
    try:
        frames, idx, d_idx, d_ref = r.read_batch_kf(3, 8, -1)
        assert len(frames) >= 1 and idx[0] == 0
        # jump into the second scene; first emitted frame must be kept
        r.seek(120)
        frames2, idx2, d_idx2, d_ref2 = r.read_batch_kf(3, 8, -1)
        assert len(frames2) >= 1
        assert idx2[0] == 120
        # and its dups (static scene) reference it, not a pre-seek frame
        assert all(ref >= 120 for ref in d_ref2)
    finally:
        r.close()
