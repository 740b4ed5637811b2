"""NMS / temporal-dedup / multi-stream engine tests."""
import numpy as np
import pytest


def test_iou_matrix():
    import jax.numpy as jnp
    from vtd_tpu.ops.nms import iou_matrix

    a = jnp.asarray([[0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    m = np.asarray(iou_matrix(a, b))
    assert abs(m[0, 0] - 1.0) < 1e-6
    assert abs(m[0, 1] - 25 / 175) < 1e-4
    assert m[1, 0] == 0.0


def test_nms_suppresses_overlaps():
    import jax.numpy as jnp
    from vtd_tpu.ops.nms import nms

    boxes = np.zeros((8, 4), np.float32)
    boxes[0] = [0, 0, 10, 10]
    boxes[1] = [1, 1, 11, 11]  # overlaps 0, lower score
    boxes[2] = [50, 50, 60, 60]
    scores = np.array([0.9, 0.8, 0.7, 0, 0, 0, 0, 0], np.float32)
    valid = np.array([1, 1, 1, 0, 0, 0, 0, 0], bool)
    keep = np.asarray(
        nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5)
    )
    assert keep[0] and not keep[1] and keep[2]
    assert not keep[3:].any()


def test_temporal_dedup_tracks():
    from vtd_tpu.ops.nms import temporal_dedup

    frames = []
    for fn in range(5):
        frames.append(
            {
                "frame_number": fn,
                "timestamp": fn * 0.1,
                "detections": [
                    {
                        "bbox": [100 + fn, 100, 200 + fn, 140],
                        "text": "HELLO",
                        "detection_confidence": 0.8 + 0.01 * fn,
                        "recognition_confidence": 0.9,
                        "polygon": [],
                    }
                ],
            }
        )
    frames[2]["detections"].append(
        {
            "bbox": [400, 300, 500, 340],
            "text": "WORLD",
            "detection_confidence": 0.7,
            "recognition_confidence": 0.6,
            "polygon": [],
        }
    )
    tracks = temporal_dedup(frames)
    assert len(tracks) == 2
    hello = next(t for t in tracks if t["text"] == "HELLO")
    assert hello["count"] == 5
    assert hello["first_frame"] == 0 and hello["last_frame"] == 4
    assert abs(hello["max_detection_confidence"] - 0.84) < 1e-6


def test_dedup_summary_singleton_fragment_filter():
    """Pins the documented deviation from the reference's exact-string
    set dedup (pipeliine.py:194-198): in temporal-dedup mode a
    1-character string seen in only ONE frame is treated as postprocess
    noise and dropped from detected_texts; the same string seen twice,
    or any >=2-char singleton, is kept."""
    from vtd_tpu.runtime.pipeline import _dedup_summary

    def fr(fn, dets):
        return {
            "frame_number": fn,
            "timestamp": fn * 0.1,
            "detections": [
                {
                    "bbox": bbox,
                    "text": text,
                    "detection_confidence": 0.8,
                    "recognition_confidence": 0.9,
                    "polygon": [],
                }
                for bbox, text in dets
            ],
        }

    box_a, box_b, box_c = (
        [10, 10, 60, 40], [200, 10, 260, 40], [10, 200, 90, 240],
    )
    summary = _dedup_summary(
        [
            fr(0, [(box_a, "X"), (box_b, "OK"), (box_c, "Z")]),
            fr(1, [(box_c, "Z")]),
        ]
    )
    # "X": 1-char, single frame -> dropped. "OK": >=2 chars -> kept.
    # "Z": 1-char but tracked across two frames -> kept.
    assert summary["detected_texts"] == ["OK", "Z"]
    assert summary["unique_texts"] == 2


@pytest.mark.slow
def test_multistream_engine(tmp_path):
    import cv2
    from vtd_tpu.runtime.engine import InferenceEngine
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    paths = []
    for v in range(2):
        path = str(tmp_path / f"v{v}.mp4")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240)
        )
        for i in range(30):
            frame = np.full((240, 320, 3), 255, np.uint8)
            cv2.putText(
                frame, f"VID{v}", (60, 120), cv2.FONT_HERSHEY_SIMPLEX,
                1.5, (0, 0, 0), 3,
            )
            w.write(frame)
        w.release()
        paths.append(path)

    pipeline = VideoTextPipeline(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    engine = InferenceEngine(pipeline=pipeline, max_wait_ms=30)
    try:
        results = engine.process_videos(paths, target_fps=10)
    finally:
        engine.close()
    assert set(results) == set(paths)
    for path in paths:
        r = results[path]
        assert r["status"] == "success"
        assert len(r["results"]) == 10
        nums = [f["frame_number"] for f in r["results"]]
        assert nums == sorted(nums)


@pytest.mark.slow
def test_engine_submit_batch_interop(tmp_path):
    """submit_batch resolves to the full per-slot list; per-frame
    submit_frame results for the same frames agree; a closed engine
    fails batch futures instead of hanging them."""
    import cv2
    from vtd_tpu.runtime.engine import InferenceEngine
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    pipeline = VideoTextPipeline(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    size = pipeline.host_downscale or 160
    frames = []
    for i in range(3):
        f = np.full((size, size, 3), 255, np.uint8)
        cv2.putText(
            f, "AB", (20, size // 2), cv2.FONT_HERSHEY_SIMPLEX,
            1.5, (0, 0, 0), 3,
        )
        frames.append(f)
    batch = np.stack(frames + [frames[-1]])
    valid = np.array([True, True, True, False])

    engine = InferenceEngine(pipeline=pipeline, max_wait_ms=20)
    try:
        per_slot = engine.submit_batch(
            batch, valid, orig_size=(size, size)
        ).result(timeout=300)
        single = engine.submit_frame(frames[0]).result(timeout=300)
    finally:
        engine.close()
    assert len(per_slot) == 4
    texts_batch = sorted(d["text"] for d in per_slot[0])
    texts_single = sorted(d["text"] for d in single)
    assert texts_batch == texts_single
    # padding slot yields no detections
    assert per_slot[3] == []

    fut = engine.submit_batch(batch, valid, orig_size=(size, size))
    with pytest.raises(RuntimeError):
        fut.result(timeout=10)
