"""Two-stage pipeline-parallel tests (8-device CPU mesh).

TwoStagePipeline is the program backend behind
``VideoTextPipeline(parallel_mode="two_stage")`` — detector stage on
half the devices, recognizer on the other half, same packed wire
format as the fused single-program path.
"""
import numpy as np
import pytest


def _text_frames(b=4, h=240, w=320):
    import cv2

    frames = np.full((b, h, w, 3), 235, np.uint8)
    for i in range(b):
        cv2.putText(
            frames[i], "AB12", (40, 120), cv2.FONT_HERSHEY_SIMPLEX, 1.5,
            (0, 0, 0), 3,
        )
    return frames


@pytest.fixture(scope="module")
def pipelines():
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    kwargs = dict(
        use_transformer_ocr=False, batch_size=4, max_dets=16,
        detector_input_size=160, recognizer_kwargs={"pad_batch": 32},
    )
    fused = VideoTextPipeline(**kwargs)
    two_stage = VideoTextPipeline(parallel_mode="two_stage", **kwargs)
    return fused, two_stage


def test_stage_device_split(pipelines):
    _, two_stage = pipelines
    a, b = two_stage._detect_crop.stage_devices()
    assert len(a) == 4 and len(b) == 4
    assert not set(a) & set(b)


def test_two_stage_matches_fused(pipelines):
    """process_batch through the two-stage runner produces the same
    detections as the fused single-program path."""
    fused, two_stage = pipelines
    frames = _text_frames()
    valid = np.ones(4, bool)
    ref = fused.process_batch(frames, valid)
    out = two_stage.process_batch(frames, valid)
    assert len(out) == len(ref) == 4
    for dets_out, dets_ref in zip(out, ref):
        assert len(dets_out) == len(dets_ref)
        for d_out, d_ref in zip(dets_out, dets_ref):
            assert d_out["text"] == d_ref["text"]
            assert d_out["bbox"] == d_ref["bbox"]


def test_two_stage_invalid_combo():
    from vtd_tpu.core.mesh import make_mesh
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    with pytest.raises(ValueError, match="mutually exclusive"):
        VideoTextPipeline(
            use_transformer_ocr=False, batch_size=8, max_dets=16,
            detector_input_size=160, mesh=make_mesh(),
            parallel_mode="two_stage",
        )
    with pytest.raises(ValueError, match="parallel_mode"):
        VideoTextPipeline(
            use_transformer_ocr=False, batch_size=8,
            detector_input_size=160, parallel_mode="bogus",
        )


def test_run_batches_wire_format(pipelines):
    """Raw runner API: packed uint8 batches in the fused layout."""
    _, two_stage = pipelines
    frames = _text_frames()
    out = two_stage._detect_crop.run_batches([frames, frames])
    assert len(out) == 2
    for (pack,) in out:
        assert pack.dtype == np.uint8
        assert pack.shape[:2] == (4, 16)


def test_two_stage_transformer_smoke():
    """Transformer path: detect on group A, KV-cache decode on group B
    (params staged to B), end-to-end through process_batch."""
    from vtd_tpu.models.trocr import small_config
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    p = VideoTextPipeline(
        use_transformer_ocr=True, batch_size=4, max_dets=8,
        detector_input_size=160, parallel_mode="two_stage",
        recognizer_kwargs={
            "transformer_config": small_config(), "pad_batch": 4,
        },
    )
    frames = _text_frames(b=4)
    out = p.process_batch(frames, np.ones(4, bool))
    assert len(out) == 4
    for dets in out:
        for d in dets:
            assert isinstance(d["text"], str)


def test_two_stage_forwards_max_box_frac():
    """Regression: ``VideoTextPipeline(parallel_mode="two_stage",
    max_box_frac=...)`` must reach the stage-A db_postprocess — it was
    silently dropped (always 0.95) before round 5, so random-weight
    smokes that disable the border filter with 1.0 diverged from the
    fused path."""
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    p = VideoTextPipeline(
        use_transformer_ocr=False, batch_size=4, max_dets=8,
        detector_input_size=160, parallel_mode="two_stage",
        max_box_frac=1.0, recognizer_kwargs={"pad_batch": 32},
    )
    assert p._detect_crop.max_box_frac == 1.0
