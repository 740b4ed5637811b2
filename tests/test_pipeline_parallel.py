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
