"""Preprocess / crop / CTC op tests."""
import cv2
import numpy as np
import pytest


def test_preprocess_shapes_and_normalization():
    import jax.numpy as jnp
    from vtd_tpu.ops.preprocess import preprocess_frames

    frames = np.full((2, 480, 640, 3), 128, np.uint8)
    out = np.asarray(
        preprocess_frames(jnp.asarray(frames), out_size=320, dtype=jnp.float32)
    )
    assert out.shape == (2, 320, 320, 3)
    expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0, 0], expected, atol=1e-3)


def test_preprocess_bgr_to_rgb():
    import jax.numpy as jnp
    from vtd_tpu.ops.preprocess import preprocess_frames

    frames = np.zeros((1, 64, 64, 3), np.uint8)
    frames[..., 0] = 255  # blue channel in BGR
    out = np.asarray(
        preprocess_frames(jnp.asarray(frames), out_size=64, dtype=jnp.float32)
    )
    # after BGR->RGB, channel 2 (R position holds blue's 255)
    assert out[0, 0, 0, 2] > out[0, 0, 0, 0]


def test_crop_and_resize_matches_cv2(rng):
    import jax.numpy as jnp
    from vtd_tpu.ops.crop import crop_and_resize_boxes

    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 50, 300, 120], [0, 0, 64, 32]], np.float32)
    valid = np.array([True, True])
    ours = np.asarray(
        crop_and_resize_boxes(jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid))
    )
    assert ours.shape == (2, 32, 128, 3)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        ref = (
            cv2.resize(
                img[y1:y2, x1:x2].astype(np.float32),
                (128, 32),
                interpolation=cv2.INTER_LINEAR,
            )
            / 255.0
        )
        err = np.abs(ours[i] - ref).mean()
        assert err < 0.02, f"crop {i} mean err {err}"


def test_crop_mm_matches_cv2(rng):
    import jax.numpy as jnp
    from vtd_tpu.ops.crop import crop_and_resize_boxes_mm

    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 50, 300, 120], [0, 0, 64, 32]], np.float32)
    valid = np.array([True, True])
    ours = np.asarray(
        crop_and_resize_boxes_mm(
            jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid)
        )
    )
    assert ours.shape == (2, 32, 128, 3)
    for i, (x1, y1, x2, y2) in enumerate(boxes.astype(int)):
        ref = (
            cv2.resize(
                img[y1:y2, x1:x2].astype(np.float32),
                (128, 32),
                interpolation=cv2.INTER_LINEAR,
            )
            / 255.0
        )
        err = np.abs(ours[i] - ref).mean()
        assert err < 0.02, f"crop {i} mean err {err}"


def test_crop_invalid_slots_zero(rng):
    import jax.numpy as jnp
    from vtd_tpu.ops.crop import crop_and_resize_boxes

    img = rng.integers(0, 255, (480, 640, 3), np.uint8)
    boxes = np.array([[100, 50, 300, 120], [0, 0, 0, 0]], np.float32)
    valid = np.array([True, False])
    out = np.asarray(
        crop_and_resize_boxes(jnp.asarray(img), jnp.asarray(boxes), jnp.asarray(valid))
    )
    assert np.all(out[1] == 0)
    assert out[0].max() > 0


def test_rectify_polygons_straightens_rotated_text(rng):
    import jax.numpy as jnp
    from vtd_tpu.ops.crop import rectify_polygons

    # A rotated rect region filled with a horizontal gradient along its
    # long axis should rectify to a horizontal gradient strip.
    img = np.zeros((400, 400, 3), np.float32)
    box = cv2.boxPoints(((200, 200), (200, 50), 30.0))
    cv2.fillPoly(img, [np.round(box).astype(np.int32)], (255, 255, 255))
    polys = box[None].astype(np.float32)  # [1, 4, 2]
    out = np.asarray(
        rectify_polygons(
            jnp.asarray((img).astype(np.uint8)),
            jnp.asarray(polys),
            jnp.asarray(np.array([True])),
        )
    )
    assert out.shape == (1, 32, 128, 3)
    # interior of the rectified strip should be ~white
    assert out[0, 8:24, 16:112].mean() > 0.95


def test_yuv420_roundtrip(rng):
    import jax.numpy as jnp
    from vtd_tpu.ops.preprocess import yuv420_to_bgr

    bgr = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    packed = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in bgr]
    )
    rec = np.asarray(yuv420_to_bgr(jnp.asarray(packed))).astype(np.float32)
    # chroma subsampling loses detail on random noise; compare against
    # OpenCV's own inverse, which suffers identically
    ref = np.stack(
        [cv2.cvtColor(p, cv2.COLOR_YUV2BGR_I420) for p in packed]
    ).astype(np.float32)
    err = np.abs(rec - ref).mean()
    assert err < 3.0, err


def test_yuv_pipeline_matches_bgr():
    """Preprocessing on YUV-shipped frames approximates the BGR path on
    realistic (smooth-chroma) content — 4:2:0 subsampling is only lossy
    on per-pixel random chroma, which no real footage has."""
    import jax.numpy as jnp
    from vtd_tpu.ops.preprocess import preprocess_frames, yuv420_to_bgr

    yy, xx = np.mgrid[0:64, 0:64]
    bgr = np.stack(
        [
            (xx * 2).astype(np.uint8),
            (yy * 2).astype(np.uint8),
            ((xx + yy)).astype(np.uint8),
        ],
        axis=-1,
    )[None].repeat(2, axis=0)
    cv2.putText(bgr[0], "TXT", (5, 40), cv2.FONT_HERSHEY_SIMPLEX, 1, (0, 0, 0), 2)
    packed = np.stack(
        [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in bgr]
    )
    a = np.asarray(
        preprocess_frames(jnp.asarray(bgr), out_size=64, dtype=jnp.float32)
    )
    b = np.asarray(
        preprocess_frames(
            yuv420_to_bgr(jnp.asarray(packed)), out_size=64,
            dtype=jnp.float32,
        )
    )
    assert np.abs(a - b).mean() < 0.15  # normalized units


def test_ctc_greedy_decode():
    import jax.numpy as jnp
    from vtd_tpu.models.crnn import CRNN_VOCAB
    from vtd_tpu.ops.ctc import decode_batch

    V = len(CRNN_VOCAB)
    T = 8
    # "aa" -> ids for 'a' twice separated by blank; repeats collapse
    a = CRNN_VOCAB["a"]
    b = CRNN_VOCAB["b"]
    seq = [a, a, 0, a, b, b, 0, 0]  # decodes to "aab"
    logits = np.full((1, T, V), -10.0, np.float32)
    for t, i in enumerate(seq):
        logits[0, t, i] = 10.0
    out = decode_batch(jnp.asarray(logits))
    assert out[0][0] == "aab"
    assert out[0][1] > 0.99


def test_ctc_decode_empty_and_unk():
    import jax.numpy as jnp
    from vtd_tpu.models.crnn import CRNN_VOCAB
    from vtd_tpu.ops.ctc import decode_batch

    V = len(CRNN_VOCAB)
    logits = np.full((2, 4, V), -10.0, np.float32)
    logits[0, :, 0] = 10.0  # all blanks
    logits[1, :, 96] = 10.0  # all <unk> -> skipped
    out = decode_batch(jnp.asarray(logits))
    assert out[0] == ("", 0.0)
    assert out[1][0] == ""
