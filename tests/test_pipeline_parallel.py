"""Two-stage pipeline-parallel runner tests (8-device CPU mesh)."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def runner():
    from vtd_tpu.parallel.pipeline import TwoStagePipeline
    from vtd_tpu.runtime.detector import TextDetector
    from vtd_tpu.runtime.recognizer import TextRecognizer

    det = TextDetector(input_size=160, max_dets=16)
    rec = TextRecognizer(use_transformer=False, pad_batch=32)
    return TwoStagePipeline(det, rec, max_dets=16), det, rec


def test_stage_device_split(runner):
    tsp, _, _ = runner
    a, b = tsp.stage_devices()
    assert len(a) == 4 and len(b) == 4
    assert not set(a) & set(b)


def test_two_stage_matches_fused(runner):
    import cv2

    tsp, det, rec = runner
    frames = np.full((4, 160, 160, 3), 255, np.uint8)
    for i in range(4):
        cv2.putText(
            frames[i], "AB", (30, 90), cv2.FONT_HERSHEY_SIMPLEX, 2, (0, 0, 0), 4
        )

    out = tsp.run_batches([frames, frames])
    assert len(out) == 2
    for rec_out in out:
        assert rec_out["det_pack"].shape == (4, 16, 14)
        assert rec_out["ids"].shape[0] == 4 * 16
        assert np.isfinite(rec_out["det_pack"]).all()
    # both batches identical input -> identical output
    np.testing.assert_allclose(
        out[0]["det_pack"], out[1]["det_pack"], atol=1e-5
    )

    # Parity with the single-group detector path. Tolerance is ONE
    # PIXEL: the two paths are separately compiled XLA programs, and
    # near-ties in the min-area-rect angle search can break to adjacent
    # candidates under different fusion/reassociation, moving a box
    # edge by <=1px. Sub-pixel-identical output across distinct
    # compilations is not part of the contract; pixel-level is.
    ref = det.detect_batch_arrays(frames, 0.5)
    ref_boxes = np.asarray(ref["boxes"])
    np.testing.assert_allclose(
        out[0]["det_pack"][..., :4], ref_boxes, atol=1.0
    )


def test_detect_batch_packed_matches_arrays(runner):
    """detect_batch (single packed f16 fetch) agrees with the
    detect_batch_arrays dict path it was derived from."""
    import cv2

    from vtd_tpu.ops.db_postprocess import extract_detections

    _, det, _ = runner
    frames = np.full((2, 160, 160, 3), 255, np.uint8)
    for i in range(2):
        cv2.putText(
            frames[i], "AB", (30, 90), cv2.FONT_HERSHEY_SIMPLEX, 2,
            (0, 0, 0), 4,
        )
    packed = det.detect_batch(frames, 0.5)
    post = {k: np.asarray(v) for k, v in
            det.detect_batch_arrays(frames, 0.5).items()}
    for i in range(2):
        ref = extract_detections(
            {k: v[i] for k, v in post.items()}, 160, 160, det.input_size
        )
        assert len(packed[i]) == len(ref) >= 1
        for a, b in zip(packed[i], ref):
            # f16 carries pixel coords exactly up to 2048; scores round
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1)
            assert abs(a["confidence"] - b["confidence"]) < 1e-2
