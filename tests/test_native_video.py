"""Native libav decoder (native/video_decode.cpp) vs the cv2 decode path.

The native backend must reproduce the cv2 stack's sampling contract
exactly (same candidate indices/timestamps — reference stride semantics,
app/ml/utils/preprocessing.py:43-72) and its pixels approximately (the
scale runs in yuv space inside swscale instead of BGR in cv2, so small
rounding/chroma-siting differences are expected and the detector parity
gates absorb them).
"""
import cv2
import numpy as np
import pytest

from vtd_tpu.native import video as native_video
from vtd_tpu.video.processor import VideoProcessor


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nv") / "clip.mp4")
    w, h = 640, 360
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    rng = np.random.default_rng(0)
    for i in range(90):
        frame = np.full((h, w, 3), 40 + i, np.uint8)
        cv2.putText(
            frame, f"FRAME {i}", (40, 180), cv2.FONT_HERSHEY_SIMPLEX,
            1.5, (255, 255, 255), 3,
        )
        cv2.circle(
            frame, (int(100 + 3 * i), 90), 30,
            tuple(int(c) for c in rng.integers(0, 255, 3)), -1,
        )
        writer.write(frame)
    writer.release()
    return path


@pytest.fixture(scope="module")
def lib_ok():
    if not native_video.available():
        pytest.skip("native video decoder unavailable on this host")


def test_probe_matches_cv2(clip, lib_ok):
    r = native_video.open_video(clip, (64, 64))
    info = VideoProcessor().get_video_info(clip)
    assert r.fps == pytest.approx(info["fps"])
    assert r.frame_count == info["frame_count"]
    assert (r.src_w, r.src_h) == (info["width"], info["height"])
    r.close()


def test_odd_source_dims_i420_safe(tmp_path, lib_ok):
    """Odd-dimension sources must not overflow the I420 buffers: the
    reader rounds output dims down to even (I420 plane math needs it)
    and decodes cleanly at raw source size (host_downscale unset)."""
    path = str(tmp_path / "odd.mp4")
    w, h = 321, 181  # both odd
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (w, h)
    )
    for i in range(12):
        frame = np.full((h, w, 3), 200, np.uint8)
        cv2.putText(frame, str(i), (20, 90), cv2.FONT_HERSHEY_SIMPLEX,
                    2, (0, 0, 0), 3)
        writer.write(frame)
    writer.release()

    r = native_video.open_video(path, (w, h))  # raw dims, as the CLI does
    if r is None:
        pytest.skip("container unsupported by native decoder")
    assert r.out_w % 2 == 0 and r.out_h % 2 == 0
    frames, idx = r.read_batch(1, 12)
    r.close()
    assert len(frames) > 0
    assert frames.shape[1:] == (r.out_h * 3 // 2, r.out_w)
    # Y plane of a ~uniform 200-gray frame should be bright everywhere
    assert frames[0][: r.out_h].mean() > 150


def test_stride_indices_and_eof(clip, lib_ok):
    r = native_video.open_video(clip, (320, 320))
    seen = []
    while True:
        frames, idx = r.read_batch(3, 8)
        if len(frames) == 0:
            break
        assert frames.shape[1:] == (480, 320)  # I420 pack: H*3/2 rows
        seen.extend(idx.tolist())
    r.close()
    assert seen == list(range(0, 90, 3))


def test_seek_is_frame_accurate(clip, lib_ok):
    r = native_video.open_video(clip, (320, 320))
    r.seek(60)
    _, idx = r.read_batch(3, 4)
    r.close()
    assert idx.tolist() == [60, 63, 66, 69]


def test_pixels_close_to_cv2(clip, lib_ok):
    r = native_video.open_video(clip, (320, 320), "bgr")
    frames, idx = r.read_batch(30, 3)
    r.close()
    vp = VideoProcessor()
    for f, i in zip(frames, idx):
        ref = vp.extract_single_frame(clip, int(i))
        ref = cv2.resize(ref, (320, 320), interpolation=cv2.INTER_LINEAR)
        diff = np.abs(f.astype(int) - ref.astype(int))
        assert diff.mean() < 4.0, diff.mean()


def test_batches_parity_native_vs_cv2(clip, lib_ok):
    """extract_frame_batches must emit identical batch structure
    (frame_numbers, timestamps, valid, orig_size) on both backends."""
    vp = VideoProcessor()
    kw = dict(
        batch_size=4, target_fps=10.0, resize_to=320, pixel_format="yuv420"
    )
    nat = list(vp.extract_frame_batches(clip, decode_backend="native", **kw))
    ref = list(vp.extract_frame_batches(clip, decode_backend="cv2", **kw))
    assert len(nat) == len(ref)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a["frame_numbers"], b["frame_numbers"])
        np.testing.assert_allclose(a["timestamps"], b["timestamps"])
        np.testing.assert_array_equal(a["valid"], b["valid"])
        assert tuple(a["orig_size"]) == tuple(b["orig_size"])
        assert a["frames"].shape == b["frames"].shape
        # pixels: same content modulo yuv-vs-bgr scaling rounding
        diff = np.abs(
            a["frames"].astype(int) - b["frames"].astype(int)
        ).mean()
        assert diff < 6.0, diff


def test_native_keyframe_mode_dups(clip, lib_ok):
    """Keyframe sampling works on the native backend: static spans are
    deduped into `dups` entries referencing the covering keyframe."""
    path = clip.replace("clip.mp4", "static.mp4")
    w, h = 640, 360
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (w, h)
    )
    frame = np.full((h, w, 3), 90, np.uint8)
    cv2.putText(frame, "STATIC", (40, 180), cv2.FONT_HERSHEY_SIMPLEX,
                2.0, (0, 0, 0), 4)
    for _ in range(60):
        writer.write(frame)
    writer.release()
    vp = VideoProcessor()
    batches = list(
        vp.extract_frame_batches(
            path, batch_size=4, target_fps=10.0, resize_to=320,
            sample_mode="keyframe", decode_backend="native",
        )
    )
    shipped = sum(int(b["valid"].sum()) for b in batches if b["frames"] is not None)
    dups = [d for b in batches for d in b.get("dups") or []]
    assert shipped + len(dups) == 20  # every stride candidate accounted
    assert shipped < 20  # static video -> most frames deduped
    for fn, ts, ref_fn in dups:
        assert ref_fn <= fn
