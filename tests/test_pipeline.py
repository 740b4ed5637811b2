"""End-to-end pipeline tests on a synthetic video.

Mirrors the reference integration strategy (tests/test_integration.py:
a real cv2.VideoWriter clip with burned-in text, real decode/batching/
summary; small/random models).
"""
import cv2
import numpy as np
import pytest
import asyncio


@pytest.fixture(scope="module")
def sample_video(tmp_path_factory):
    """3-second 320x240 @ 30fps mp4 with 'HELLO WORLD' burned in."""
    path = str(tmp_path_factory.mktemp("vid") / "sample.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240)
    )
    for i in range(90):
        frame = np.full((240, 320, 3), 255, np.uint8)
        if (i // 15) % 2 == 0:
            cv2.putText(
                frame, "HELLO WORLD", (20, 120),
                cv2.FONT_HERSHEY_SIMPLEX, 0.8, (0, 0, 0), 2,
            )
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


def test_video_processor_metadata(sample_video):
    from vtd_tpu.video import VideoProcessor

    info = VideoProcessor().get_video_info(sample_video)
    assert info["width"] == 320
    assert info["height"] == 240
    assert abs(info["fps"] - 30.0) < 0.1
    assert 85 <= info["frame_count"] <= 95
    assert 2.5 < info["duration"] < 3.5
    assert info["format"] == ".mp4"


def test_frame_extraction_fps_throttling(sample_video):
    from vtd_tpu.video import VideoProcessor

    frames = list(VideoProcessor().extract_frames_at_fps(sample_video, 10))
    # 90 frames at 30fps -> stride 3 -> 30 extracted
    assert 28 <= len(frames) <= 32
    frame, idx, ts = frames[0]
    assert frame.shape == (240, 320, 3)
    assert idx == 0 and ts == 0.0
    # timestamps increase by stride/fps = 0.1 s
    assert abs(frames[1][2] - 0.1) < 1e-6


def test_frame_batches_fixed_shapes(sample_video):
    from vtd_tpu.video import VideoProcessor

    batches = list(
        VideoProcessor().extract_frame_batches(
            sample_video, batch_size=8, target_fps=10
        )
    )
    assert all(b["frames"].shape == (8, 240, 320, 3) for b in batches)
    total_valid = sum(int(b["valid"].sum()) for b in batches)
    assert 28 <= total_valid <= 32
    # last batch may be padded
    assert batches[-1]["valid"].dtype == bool


def test_video_processor_missing_file():
    from vtd_tpu.video import VideoProcessor

    assert VideoProcessor().get_video_info("/nonexistent/x.mp4") == {}
    frames = list(
        VideoProcessor().extract_frames_at_fps("/nonexistent/x.mp4", 10)
    )
    assert frames == []


def test_process_video_schema(sample_video, small_pipeline):
    result = asyncio.run(small_pipeline.process_video(sample_video, ""))
    assert result["status"] == "success"
    assert "summary" in result and "video_info" in result
    s = result["summary"]
    for key in (
        "total_frames", "frames_with_text", "total_detections",
        "unique_texts", "detected_texts", "avg_detection_confidence",
        "avg_recognition_confidence", "processing_time_seconds",
        "fps_processed",
    ):
        assert key in s
    assert s["total_frames"] == len(result["results"])
    for fr in result["results"]:
        assert set(fr) == {"frame_number", "timestamp", "detections"}
        for d in fr["detections"]:
            assert set(d) == {
                "bbox", "text", "detection_confidence",
                "recognition_confidence", "polygon",
            }


def test_process_video_progress_callback(sample_video, small_pipeline):
    calls = []

    async def cb(progress, done, total):
        calls.append((progress, done, total))

    asyncio.run(small_pipeline.process_video(sample_video, "", progress_callback=cb))
    assert calls
    # monotonic progress ending at ~1.0
    progs = [c[0] for c in calls]
    assert progs == sorted(progs)
    assert 0.9 <= progs[-1] <= 1.01


def test_process_video_failure_path(small_pipeline):
    result = asyncio.run(small_pipeline.process_video("/nonexistent/file.mp4", ""))
    assert result["status"] == "failed"
    assert "error" in result
    assert result["results"] == []


def test_process_single_frame(small_pipeline, text_image):
    out = small_pipeline.process_single_frame(text_image)
    assert "detections" in out
    for d in out["detections"]:
        assert set(d) == {
            "bbox", "text", "detection_confidence", "recognition_confidence",
        }


def test_recognizer_facade_crnn(rng):
    from vtd_tpu.runtime import TextRecognizer

    rec = TextRecognizer(use_transformer=False, pad_batch=8)
    crops = [
        rng.integers(0, 255, (40, 200, 3), np.uint8),
        rng.integers(0, 255, (20, 80, 3), np.uint8),
    ]
    out = rec.recognize_batch(crops)
    assert len(out) == 2
    for r in out:
        assert set(r) == {"text", "confidence"}
        assert isinstance(r["text"], str)
    single = rec.recognize(crops[0])
    assert single["text"] == out[0]["text"]


def test_min_recognition_confidence_filter(sample_video, small_pipeline):
    """The OCR-confidence output filter: default 0.0 never filters
    (reference parity — its hardcoded 0.95 confidence passes every
    threshold); an impossible bar drops every transcript."""
    base = asyncio.run(small_pipeline.process_video(sample_video, ""))
    filtered = asyncio.run(
        small_pipeline.process_video(
            sample_video, "", min_recognition_confidence=1.1
        )
    )
    assert filtered["status"] == "success"
    assert filtered["summary"]["total_detections"] == 0
    # default run unaffected by the knob's existence
    assert base["summary"]["total_detections"] >= 0
    n_base = sum(len(f["detections"]) for f in base["results"])
    assert n_base == base["summary"]["total_detections"]


def test_rec_budget_matches_full_recognition(text_image):
    """The CRNN recognition budget (top-(valid, score) crop slots only)
    must be output-invisible whenever actual detections fit within the
    budget: transcripts equal the recognize-every-slot program's."""
    from vtd_tpu.runtime import VideoTextPipeline

    kwargs = dict(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        # random weights respond to the whole frame; these tests check
        # budget/validity mechanics, so the border-artifact filter is off
        max_box_frac=1.0,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    frames = np.stack([text_image] * 4)
    valid = np.ones(4, bool)

    full = VideoTextPipeline(rec_budget=4 * 16, **kwargs)
    out_full = full.process_batch(frames, valid)
    budgeted = VideoTextPipeline(rec_budget=8, **kwargs)
    out_b = budgeted.process_batch(frames, valid)

    n_dets = sum(len(d) for d in out_full)
    assert n_dets <= 8, "fixture grew text-denser than the test budget"
    assert [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_b
    ] == [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_full
    ]


def test_rec_budget_padding_frames_do_not_consume_slots(text_image):
    """Batch tails are padded with duplicates of the last real frame;
    their (masked-invalid) detections must not occupy recognition-budget
    slots that real detections need."""
    from vtd_tpu.runtime import VideoTextPipeline

    kwargs = dict(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        # random weights respond to the whole frame; these tests check
        # budget/validity mechanics, so the border-artifact filter is off
        max_box_frac=1.0,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    frames = np.stack([text_image] * 4)  # [0:2] real, [2:4] "padding"
    valid = np.array([True, True, False, False])

    full = VideoTextPipeline(rec_budget=4 * 16, **kwargs)
    out_full = full.process_batch(frames, valid)
    n_real = sum(len(d) for d in out_full)
    assert n_real > 0
    assert all(len(d) == 0 for d in out_full[2:])

    # Budget exactly the real detections: if padding duplicates (same
    # text-dense frame) consumed slots, some real detection would lose
    # its transcript.
    tight = VideoTextPipeline(rec_budget=n_real, **kwargs)
    out_t = tight.process_batch(frames, valid)
    assert [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_t
    ] == [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_full
    ]
    assert all(d["text"] for dets in out_t[:2] for d in dets)


def test_rec_budget_overflow_recovers_all_transcripts(text_image):
    """Text-dense batch with MORE valid detections than the recognition
    budget: the pipeline must run the full-budget second pass so every
    detection still carries its transcript (the reference recognizes
    every crop — pipeliine.py:117-133; pre-round-5 the extras shipped
    with text='')."""
    from vtd_tpu.runtime import VideoTextPipeline

    kwargs = dict(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        max_box_frac=1.0,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    frames = np.stack([text_image] * 4)
    valid = np.ones(4, bool)

    full = VideoTextPipeline(rec_budget=4 * 16, **kwargs)
    out_full = full.process_batch(frames, valid)
    n_dets = sum(len(d) for d in out_full)
    assert n_dets >= 2, "fixture too sparse to overflow a budget of 1"

    # budget strictly below the detection count -> guaranteed overflow
    tight = VideoTextPipeline(rec_budget=max(1, n_dets // 2), **kwargs)
    out_t = tight.process_batch(frames, valid)
    assert sum(len(d) for d in out_t) == n_dets
    assert all(d["text"] for dets in out_t for d in dets), out_t
    assert [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_t
    ] == [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_full
    ]
    # after the first overflow the pipeline latches to the full-budget
    # program — later batches take one pass and still match
    assert tight._full_budget_latched
    out_t2 = tight.process_batch(frames, valid)
    assert [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_t2
    ] == [
        [(d["text"], d["bbox"]) for d in dets] for dets in out_full
    ]


def test_f32_pack_above_f16_safe_input(monkeypatch, text_image):
    """Detector input sizes past the f16 precision budget switch the
    packed transfer's det block to float32 (coords would otherwise
    quantize >= 0.5 px); the host parser follows the same rule."""
    import vtd_tpu.runtime.pipeline as rp

    monkeypatch.setattr(rp, "_F16_SAFE_INPUT", 64)
    pipe = rp.VideoTextPipeline(
        use_transformer_ocr=False,
        batch_size=2,
        max_dets=8,
        detector_input_size=160,  # > patched budget -> f32 pack
        recognizer_kwargs={"pad_batch": 16},
    )
    assert pipe._pack_np == np.float32
    frames = np.stack([text_image, text_image])
    per_frame = pipe.process_batch(frames, np.ones(2, bool))
    assert len(per_frame) == 2
    for dets in per_frame:
        for d in dets:
            x1, y1, x2, y2 = d["bbox"]
            assert 0 <= x1 <= x2 and 0 <= y1 <= y2


@pytest.fixture(scope="module")
def tail_padded_video(tmp_path_factory):
    """0.6-second clip whose 10-fps sampling yields 6 frames -> a full
    4-frame batch plus a tail batch of 2 real + 2 padding frames. The
    final sampled frame is text-dense so its padding duplicates generate
    budget-competing detections."""
    path = str(tmp_path_factory.mktemp("vid") / "tail.mp4")
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (320, 240)
    )
    for i in range(18):
        frame = np.full((240, 320, 3), 255, np.uint8)
        if i >= 15:  # the last sampled frame (15): dense text
            for row, t in enumerate(["ALPHA BETA", "GAMMA DELTA", "EPSILON"]):
                cv2.putText(
                    frame, t, (20, 60 + 60 * row),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.9, (0, 0, 0), 2,
                )
        else:  # sparse frames
            cv2.putText(
                frame, "HI", (130, 120),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (40, 40, 40), 1,
            )
        writer.write(frame)
    writer.release()
    return path


def test_process_video_dispatches_frame_validity(sample_video):
    """Regression: the process_video dispatcher thread must pass each
    batch's valid mask into the fused program (round 3 shipped the mask
    but only plumbed it through process_batch; the video path silently
    treated tail padding as real frames)."""
    from vtd_tpu.runtime import VideoTextPipeline

    pipe = VideoTextPipeline(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        # random weights respond to the whole frame; these tests check
        # budget/validity mechanics, so the border-artifact filter is off
        max_box_frac=1.0,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    seen = []
    orig = pipe._dispatch_batch

    def spy(frames, confidence_threshold=None, valid_frames=None):
        seen.append(valid_frames)
        return orig(
            frames, confidence_threshold=confidence_threshold,
            valid_frames=valid_frames,
        )

    pipe._dispatch_batch = spy
    result = asyncio.run(pipe.process_video(sample_video, ""))
    assert result["status"] == "success"
    assert seen, "dispatcher never ran"
    assert all(v is not None for v in seen), (
        "a dispatched batch lost its frame-validity mask"
    )
    # the clip is 90 frames @ 30fps sampled at 10fps -> 30 frames ->
    # 7 full/partial batches of 4; the last has 2 real + 2 padding
    assert seen[-1].dtype == bool
    assert not seen[-1].all(), "tail batch should contain padding frames"


def test_process_video_tail_budget_transcripts(tail_padded_video):
    """Black-box version via the public video path: with rec_budget set
    exactly to the densest batch's real-detection count, tail-padding
    duplicates must not steal recognition slots — every detection the
    full-budget run transcribes keeps its transcript."""
    from vtd_tpu.runtime import VideoTextPipeline

    kwargs = dict(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        # random weights respond to the whole frame; these tests check
        # budget/validity mechanics, so the border-artifact filter is off
        max_box_frac=1.0,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
        target_fps=10.0,
    )
    full = VideoTextPipeline(rec_budget=4 * 16, **kwargs)
    base = asyncio.run(full.process_video(tail_padded_video, ""))
    assert base["status"] == "success"
    results = sorted(base["results"], key=lambda r: r["frame_number"])
    assert len(results) == 6
    # per-batch real detection totals under 10-fps sampling: frames
    # [0,3,6,9] then tail [12,15]
    batch_counts = [
        sum(len(r["detections"]) for r in results[:4]),
        sum(len(r["detections"]) for r in results[4:]),
    ]
    assert results[-1]["detections"], "dense final frame detected nothing"
    budget = max(batch_counts)
    tight = VideoTextPipeline(rec_budget=budget, **kwargs)
    out = asyncio.run(tight.process_video(tail_padded_video, ""))
    assert out["status"] == "success"
    tight_results = sorted(out["results"], key=lambda r: r["frame_number"])
    assert [
        [(d["text"], d["bbox"]) for d in r["detections"]]
        for r in tight_results
    ] == [
        [(d["text"], d["bbox"]) for d in r["detections"]]
        for r in results
    ]


def test_detector_yuv420_transfer_parity(text_image):
    """transfer_format='yuv420' ships I420-packed frames (half the
    bytes over the host link) and unpacks on device. Bit-exact check:
    a BGR detector fed the device-roundtripped frames must produce
    identical detections to the yuv420 detector fed the original BGR
    frames — both programs see the same uint8 tensor after the device
    unpack."""
    import cv2
    import jax.numpy as jnp

    from vtd_tpu.ops.preprocess import yuv420_to_bgr
    from vtd_tpu.runtime.detector import TextDetector

    frames = np.stack([text_image, text_image[::-1].copy()])
    det_yuv = TextDetector(
        input_size=160, max_dets=16, max_box_frac=1.0, seed=0,
        transfer_format="yuv420",
    )
    det_bgr = TextDetector(
        input_size=160, max_dets=16, max_box_frac=1.0, seed=0,
    )
    packed = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in frames]
    )
    roundtripped = np.asarray(yuv420_to_bgr(jnp.asarray(packed)))

    out_yuv = det_yuv.detect_batch(frames)
    out_ref = det_bgr.detect_batch(roundtripped)
    assert [
        [(d["bbox"], d["confidence"]) for d in dets] for dets in out_yuv
    ] == [
        [(d["bbox"], d["confidence"]) for d in dets] for dets in out_ref
    ]
    # already-packed input passes through (the decoder ships I420)
    out_packed = det_yuv.detect_batch(packed)
    assert [
        [d["bbox"] for d in dets] for dets in out_packed
    ] == [
        [d["bbox"] for d in dets] for dets in out_yuv
    ]
    with pytest.raises(ValueError, match="transfer_format"):
        TextDetector(input_size=160, transfer_format="rgb")
