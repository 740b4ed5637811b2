"""Host-side video decode and image utilities.

API parity with the reference's ``VideoProcessor`` / ``ImageProcessor``
/ ``AnnotationProcessor`` (reference ``app/ml/utils/preprocessing.py``),
plus a TPU-oriented addition: ``extract_frame_batches`` — a prefetching
iterator that yields *fixed-size* uint8 frame batches ready for a single
host->device transfer, instead of the reference's one-frame-at-a-time
async generator (``preprocessing.py:74-84``). Decode runs in a
background thread so the accelerator never waits on ``cap.read()``.
"""
from __future__ import annotations

import asyncio
import logging
import queue
import threading
from contextlib import contextmanager
from pathlib import Path
from typing import (
    Any,
    AsyncGenerator,
    Dict,
    Generator,
    List,
    Optional,
    Tuple,
)

import cv2
import numpy as np

logger = logging.getLogger(__name__)


@contextmanager
def _capture(video_path: str):
    """Open a cv2.VideoCapture, guaranteeing release."""
    cap = cv2.VideoCapture(video_path)
    try:
        yield cap
    finally:
        cap.release()


# Integer-valued probe properties; fps stays float.
_INT_PROPS = {
    "frame_count": cv2.CAP_PROP_FRAME_COUNT,
    "width": cv2.CAP_PROP_FRAME_WIDTH,
    "height": cv2.CAP_PROP_FRAME_HEIGHT,
}


class VideoProcessor:
    """Video metadata probe + fps-throttled frame extraction.

    Behavior parity with reference ``preprocessing.py:11-98`` (probe
    keys, supported containers, stride semantics, safe-default error
    handling) on an own decode stack built around ``_capture`` and the
    batched prefetcher below.
    """

    def __init__(self):
        # Container allowlist matching the reference (preprocessing.py:13)
        self.supported_formats = [".mp4", ".avi", ".mov", ".mkv", ".wmv"]

    def get_video_info(self, video_path: str) -> Dict[str, Any]:
        """Probe fps/frames/size/duration; `{}` on failure (the
        reference's safe-default contract, preprocessing.py:15-41)."""
        try:
            with _capture(video_path) as cap:
                if not cap.isOpened():
                    raise ValueError(f"Cannot open video: {video_path}")
                info: Dict[str, Any] = {
                    k: int(cap.get(prop)) for k, prop in _INT_PROPS.items()
                }
                info["fps"] = cap.get(cv2.CAP_PROP_FPS)
            info["duration"] = (
                info["frame_count"] / info["fps"] if info["fps"] > 0 else 0
            )
            info["format"] = Path(video_path).suffix.lower()
            return info
        except Exception as e:
            logger.error("Failed to get video info: %s", e)
            return {}

    def extract_frames_at_fps(
        self, video_path: str, target_fps: float = 10
    ) -> Generator[Tuple[np.ndarray, int, float], None, None]:
        """Yield (frame, extracted_index, timestamp) at ~target_fps.

        Stride semantics match the reference (``preprocessing.py:43-72``):
        every ``max(1, int(src_fps / target_fps))``-th decoded frame.
        """
        yield from self._segment_candidates(video_path, target_fps)

    async def extract_frames_generator(
        self, video_path: str, target_fps: float = 10
    ) -> AsyncGenerator[Tuple[np.ndarray, int, float], None]:
        """Async wrapper (parity with preprocessing.py:74-84)."""
        gen = self.extract_frames_at_fps(video_path, target_fps)
        loop = asyncio.get_event_loop()
        sentinel = object()
        while True:
            item = await loop.run_in_executor(None, next, gen, sentinel)
            if item is sentinel:
                return
            yield item
            await asyncio.sleep(0)

    def extract_single_frame(
        self, video_path: str, frame_number: int
    ) -> Optional[np.ndarray]:
        """Random access to one frame; None on failure
        (preprocessing.py:86-98 contract)."""
        try:
            with _capture(video_path) as cap:
                cap.set(cv2.CAP_PROP_POS_FRAMES, frame_number)
                ok, frame = cap.read()
            return frame if ok else None
        except Exception as e:
            logger.error("Single frame extraction failed: %s", e)
            return None

    # ------------------------------------------------------------------
    # TPU-native addition: prefetched fixed-shape batches
    # ------------------------------------------------------------------
    def _segment_candidates(
        self,
        video_path: str,
        target_fps: float,
        src_range: Optional[Tuple[int, int]] = None,
        strict: bool = False,
    ) -> Generator[Tuple[np.ndarray, int, float], None, None]:
        """Yield (frame, candidate_index, timestamp) for the stride
        candidates whose source frame lies in ``src_range`` (a
        [start, end) source-frame window; the whole video when None).

        ``candidate_index`` = source_frame // interval — globally
        consistent across segments, so parallel segment decoders emit
        the exact same indices a serial pass would.
        """
        cap = cv2.VideoCapture(video_path)
        try:
            if not cap.isOpened():
                raise ValueError(f"Cannot open video: {video_path}")
            source_fps = cap.get(cv2.CAP_PROP_FPS)
            interval = (
                max(1, int(source_fps / target_fps)) if source_fps > 0 else 1
            )
            start, end = src_range if src_range else (0, None)
            if start:
                cap.set(cv2.CAP_PROP_POS_FRAMES, start)
                # Seeks land on the nearest keyframe for some codecs /
                # VFR streams; a shifted position would make parallel
                # segment workers emit different candidate indices than
                # a serial pass. Verify, and grab()-skip forward from an
                # earlier decodable position on mismatch.
                pos = int(cap.get(cv2.CAP_PROP_POS_FRAMES))
                if pos != start:
                    if pos > start or pos < 0:
                        cap.set(cv2.CAP_PROP_POS_FRAMES, 0)
                        pos = 0
                    while pos < start and cap.grab():
                        pos += 1
            frame_number = start
            while end is None or frame_number < end:
                # grab() decodes but skips the colorspace-convert/copy of
                # retrieve(); sampled frames pay the full cost, skipped
                # frames only the decode.
                if not cap.grab():
                    break
                if frame_number % interval == 0:
                    ret, frame = cap.retrieve()
                    if not ret:
                        break
                    ts = frame_number / source_fps if source_fps > 0 else 0.0
                    yield frame, frame_number // interval, ts
                frame_number += 1
        except Exception as e:
            logger.error("Frame extraction failed: %s", e)
            if strict:
                # Parallel segment decode: a swallowed mid-segment error
                # would leave a silent interior gap in the frame stream
                # (serial truncation at least stops at the error point).
                raise
            return
        finally:
            cap.release()

    @staticmethod
    def _keyframe_signature(frame: np.ndarray) -> np.ndarray:
        """Tiny grayscale thumbnail used for scene-change detection."""
        luma = frame if frame.ndim == 2 else cv2.cvtColor(
            frame, cv2.COLOR_BGR2GRAY
        )
        return cv2.resize(
            luma, (64, 36), interpolation=cv2.INTER_AREA
        ).astype(np.int16)

    def _native_candidates(
        self,
        video_path: str,
        target_fps: float,
        out_size: Tuple[int, int],
        pixel_format: str,
        src_range: Optional[Tuple[int, int]] = None,
        chunk: int = 8,
    ) -> Generator[Tuple[np.ndarray, int, float], None, None]:
        """Candidate stream from the native libav decoder
        (native/video_decode.cpp): frames arrive already scaled to
        ``out_size`` and in ``pixel_format`` — the decode->scale->convert
        chain runs inside swscale on the codec's own yuv420p planes, so
        the two full-res colorspace conversions of the cv2 path never
        happen. Same (frame, candidate_index, timestamp) contract as
        ``_segment_candidates``.
        """
        from ..native import video as native_video

        reader = native_video.open_video(video_path, out_size, pixel_format)
        if reader is None:
            raise RuntimeError("native video decoder unavailable")
        try:
            fps = reader.fps
            interval = max(1, int(fps / target_fps)) if fps > 0 else 1
            start, end = src_range if src_range else (0, None)
            if start:
                reader.seek(start)
            src_end = -1 if end is None else int(end)
            while True:
                frames, idx = reader.read_batch(interval, chunk, src_end)
                if len(frames) == 0:
                    return
                for k in range(len(frames)):
                    src = int(idx[k])
                    ts = src / fps if fps > 0 else 0.0
                    yield frames[k], src // interval, ts
        finally:
            reader.close()

    def _native_candidates_kf(
        self,
        video_path: str,
        target_fps: float,
        out_size: Tuple[int, int],
        pixel_format: str,
        keyframe_diff: float,
        keyframe_max_gap: int,
        src_range: Optional[Tuple[int, int]] = None,
        chunk: int = 8,
    ) -> Generator[Tuple[str, Any, Any, Any], None, None]:
        """Keyframe-gated candidate stream with the scene-change gate
        INSIDE the native decoder (native/video_decode.cpp
        vtd_vd_read_batch_kf): near-duplicate candidates never cross
        the ctypes boundary as pixels — no ship-size sws_scale, no
        numpy copy, no Python-side signature. On static footage ~90% of
        candidates reduce to decode + a 64x36 luma thumbnail diff.

        Yields ("frame", frame, candidate_index, timestamp) for kept
        keyframes and ("dup", candidate_index, timestamp,
        ref_candidate_index) for gated duplicates, in source order
        within each kind (the consumer's dups list is order-free).
        """
        from ..native import video as native_video

        reader = native_video.open_video(video_path, out_size, pixel_format)
        if reader is None:
            raise RuntimeError("native video decoder unavailable")
        try:
            fps = reader.fps
            interval = max(1, int(fps / target_fps)) if fps > 0 else 1
            start, end = src_range if src_range else (0, None)
            if start:
                reader.seek(start)
            src_end = -1 if end is None else int(end)
            while True:
                frames, idx, dup_idx, dup_ref = reader.read_batch_kf(
                    interval, chunk, src_end,
                    kf_diff=keyframe_diff, kf_max_gap=keyframe_max_gap,
                )
                if len(frames) == 0 and len(dup_idx) == 0:
                    return
                for k in range(len(frames)):
                    src = int(idx[k])
                    ts = src / fps if fps > 0 else 0.0
                    yield "frame", frames[k], src // interval, ts
                for k in range(len(dup_idx)):
                    src, ref = int(dup_idx[k]), int(dup_ref[k])
                    ts = src / fps if fps > 0 else 0.0
                    yield "dup", src // interval, ts, ref // interval
        finally:
            reader.close()

    def extract_frame_batches(
        self,
        video_path: str,
        batch_size: int = 8,
        target_fps: float = 10,
        prefetch: int = 2,
        resize_to: Optional[int] = None,
        pixel_format: str = "bgr",
        sample_mode: str = "stride",
        keyframe_diff: float = 4.0,
        keyframe_max_gap: Optional[int] = None,
        decode_workers: int = 1,
        decode_backend: str = "auto",
    ) -> Generator[Dict[str, Any], None, None]:
        """Yield dicts of stacked frames for one device transfer each.

        ``decode_backend``: 'native' decodes via the libav C++ tier
        (native/video_decode.cpp — scale + pixel conversion fused into
        swscale on the decoder's own yuv planes), 'cv2' via
        VideoCapture, 'auto' (default) prefers native and falls back.

        Every batch has exactly ``batch_size`` frames (the tail is padded
        by repeating the last frame, with ``valid`` marking real slots)
        so the jitted detector never recompiles. Decode runs in
        background daemon threads feeding a bounded queue (``prefetch``
        batches deep), overlapping CPU decode with TPU compute.

        ``resize_to``: host-side square resize before batching. When the
        detector input is smaller than the source (it is: 640x640), the
        full-res pixels never reach the device path except for crop
        sampling, so shipping ``resize_to``-sized frames cuts host->
        device bandwidth ~(HW / resize_to^2)x; original dims are kept in
        ``orig_size`` so detections scale back exactly.

        ``pixel_format``: 'bgr' ships [B,H,W,3] u8; 'yuv420' ships
        I420-packed [B, H*3/2, W] u8 — half the bytes — and the device
        program converts back to BGR (ops/preprocess.yuv420_to_bgr).

        ``sample_mode``: 'stride' ships every stride candidate (the
        reference's sampling, preprocessing.py:43-72); 'keyframe' ships
        only scene-change keyframes — a candidate whose downsampled-
        grayscale mean abs diff vs the last shipped keyframe is below
        ``keyframe_diff`` (and that is fewer than ``keyframe_max_gap``
        candidates after it, default ~2s worth) is recorded in the next
        batch's ``dups`` list as ``(frame_number, timestamp,
        ref_frame_number)`` instead of being shipped; the pipeline
        propagates the keyframe's detections to it.

        ``decode_workers``: >1 splits the video into that many contiguous
        source segments decoded concurrently (batches then arrive
        interleaved across segments, still frame-ordered within each).
        cv2 decode is single-threaded per capture, so this scales
        decode-bound 1080p throughput with host cores.

        Yields {'frames': u8 array | None, 'frame_numbers': [B] i64,
                'timestamps': [B] f64, 'valid': [B] bool,
                'orig_size': (h, w), 'pixel_format': str,
                'dups': [(fn, ts, ref_fn), ...]}.
        A trailing dup-only batch has ``frames=None``.
        """
        q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        stop = threading.Event()
        max_gap = keyframe_max_gap or max(1, int(2 * target_fps))

        # Backend selection. The native path needs a successful probe
        # (container/codec supported) before committing; anything else
        # falls back to the cv2 decode stack below.
        native_info: Optional[Dict[str, Any]] = None
        if decode_backend in ("auto", "native"):
            try:
                from ..native import video as native_video

                probe = native_video.open_video(
                    video_path,
                    (16, 16),  # probe only; real readers size themselves
                    "yuv420",
                )
                if probe is not None:
                    native_info = {
                        "src_h": probe.src_h,
                        "src_w": probe.src_w,
                        "fps": probe.fps,
                        "frame_count": probe.frame_count,
                    }
                    probe.close()
                elif decode_backend == "native":
                    raise ValueError(
                        f"native decode unavailable for {video_path}"
                    )
            except ValueError:
                raise
            except Exception as e:  # missing toolchain/libs -> cv2
                if decode_backend == "native":
                    raise
                logger.debug("native decode probe failed: %s", e)
        # resize_to: int -> square (reference squash semantics), or an
        # explicit (w, h) — e.g. aspect-preserved transfer dims, where
        # the device performs the final squash to the detector input.
        resize_wh: Optional[Tuple[int, int]] = (
            None if resize_to is None
            else (resize_to, resize_to) if isinstance(resize_to, int)
            else (int(resize_to[0]), int(resize_to[1]))
        )
        use_native = native_info is not None
        if use_native:
            out_size = (
                resize_wh
                if resize_wh is not None
                else (native_info["src_w"], native_info["src_h"])
            )
            if pixel_format == "yuv420":
                # I420 needs even dims (the reader enforces the same —
                # an odd dim passed through would disagree with the
                # actual frame buffers by one row on odd sources).
                out_size = (out_size[0] & ~1, out_size[1] & ~1)
            native_orig = (native_info["src_h"], native_info["src_w"])

        class _Stopped(Exception):
            pass

        def put(item) -> None:
            # Stop-aware put: a consumer that abandons the generator sets
            # ``stop``; producers blocked on a full queue must notice and
            # unwind (releasing their VideoCapture) instead of leaking.
            while True:
                try:
                    q.put(item, timeout=0.1)
                    return
                except queue.Full:
                    if stop.is_set():
                        raise _Stopped()

        def produce_segment(src_range: Optional[Tuple[int, int]]):
            try:
                _produce_segment(src_range)
            except _Stopped:
                pass  # consumer abandoned the generator; unwind quietly
            except Exception as e:
                # Forward segment failures to the consumer (which raises
                # them) instead of leaving a silent gap in coverage.
                try:
                    put(e)
                except _Stopped:
                    pass

        def _produce_segment(src_range: Optional[Tuple[int, int]]):
            buf_frames: List[np.ndarray] = []
            buf_nums: List[int] = []
            buf_ts: List[float] = []
            buf_dups: List[Tuple[int, float, int]] = []
            orig_size: List[Tuple[int, int]] = []

            def flush():
                n = len(buf_frames)
                if n == 0 and not buf_dups:
                    return
                if n == 0:  # trailing duplicates with no keyframe left
                    put({"frames": None, "dups": list(buf_dups)})
                    buf_dups.clear()
                    return
                frames = buf_frames + [buf_frames[-1]] * (batch_size - n)
                nums = buf_nums + [buf_nums[-1]] * (batch_size - n)
                ts = buf_ts + [buf_ts[-1]] * (batch_size - n)
                valid = np.zeros(batch_size, bool)
                valid[:n] = True
                put(
                    {
                        "frames": np.stack(frames),
                        "frame_numbers": np.asarray(nums, np.int64),
                        "timestamps": np.asarray(ts, np.float64),
                        "valid": valid,
                        "orig_size": orig_size[0],
                        "pixel_format": pixel_format,
                        "dups": list(buf_dups),
                    }
                )
                buf_frames.clear()
                buf_nums.clear()
                buf_ts.clear()
                buf_dups.clear()

            last_sig: Optional[np.ndarray] = None
            last_kf = -1
            since_kf = 0
            if use_native and sample_mode == "keyframe":
                # The scene-change gate runs inside the native decoder;
                # duplicates arrive as (idx, ts, ref) records only.
                for item in self._native_candidates_kf(
                    video_path, target_fps, out_size, pixel_format,
                    keyframe_diff, max_gap, src_range, chunk=batch_size,
                ):
                    if stop.is_set():
                        return
                    if item[0] == "dup":
                        _, idx, ts, ref = item
                        buf_dups.append((idx, ts, ref))
                        continue
                    _, frame, idx, ts = item
                    if not orig_size:
                        orig_size.append(native_orig)
                    buf_frames.append(frame)
                    buf_nums.append(idx)
                    buf_ts.append(ts)
                    if len(buf_frames) == batch_size:
                        flush()
                flush()
                return
            if use_native:
                candidates = self._native_candidates(
                    video_path, target_fps, out_size, pixel_format,
                    src_range, chunk=batch_size,
                )
            else:
                candidates = self._segment_candidates(
                    video_path, target_fps, src_range,
                    strict=src_range is not None,
                )
            for frame, idx, ts in candidates:
                if stop.is_set():
                    return
                if sample_mode == "keyframe":
                    # cv2 path only: the native backend gates keyframes
                    # inside the decoder (branch above).
                    sig = self._keyframe_signature(frame)
                    if last_sig is not None and since_kf < max_gap:
                        diff = float(
                            np.abs(sig - last_sig).mean()
                        )
                        if diff < keyframe_diff:
                            since_kf += 1
                            buf_dups.append((idx, ts, last_kf))
                            continue
                    last_sig, last_kf, since_kf = sig, idx, 0
                if not orig_size:
                    orig_size.append(
                        native_orig if use_native else frame.shape[:2]
                    )
                if not use_native:
                    if resize_wh is not None and frame.shape[:2] != (
                        resize_wh[1], resize_wh[0],
                    ):
                        frame = cv2.resize(
                            frame, resize_wh,
                            interpolation=cv2.INTER_LINEAR,
                        )
                    if pixel_format == "yuv420":
                        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2YUV_I420)
                buf_frames.append(frame)
                buf_nums.append(idx)
                buf_ts.append(ts)
                if len(buf_frames) == batch_size:
                    flush()
            flush()

        def coordinator():
            try:
                workers = max(1, int(decode_workers))
                if workers == 1:
                    produce_segment(None)
                else:
                    info = self.get_video_info(video_path)
                    total = int(info.get("frame_count", 0) or 0)
                    fps = info.get("fps", 0) or 0
                    interval = max(1, int(fps / target_fps)) if fps > 0 else 1
                    if total <= 0:
                        produce_segment(None)
                    else:
                        # Segment bounds aligned to the candidate stride
                        # so every worker's candidates are exactly the
                        # serial pass's.
                        cands = (total + interval - 1) // interval
                        per = max(1, (cands + workers - 1) // workers)
                        ranges = []
                        for wi in range(workers):
                            s = wi * per * interval
                            e = min((wi + 1) * per * interval, total)
                            if s < total:
                                ranges.append((s, e))
                        threads = [
                            threading.Thread(
                                target=produce_segment, args=(r,), daemon=True
                            )
                            for r in ranges
                        ]
                        for t in threads:
                            t.start()
                        for t in threads:
                            t.join()
            finally:
                try:
                    put(None)  # stop-aware: consumer may be gone
                except _Stopped:
                    pass

        t = threading.Thread(target=coordinator, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so producers can exit a blocking put
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def letterbox_geometry(
    height: int, width: int, target: int
) -> Tuple[float, int, int, int, int]:
    """(scale, new_w, new_h, x_offset, y_offset) for an
    aspect-preserving fit of (height, width) into a target square,
    centered. Shared host-side analog of the device letterbox in
    ``vtd_tpu.ops.preprocess``."""
    scale = target / max(height, width)
    nw, nh = int(width * scale), int(height * scale)
    return scale, nw, nh, (target - nw) // 2, (target - nh) // 2


class ImageProcessor:
    """Host-side image ops.

    Behavior contracts from reference ``preprocessing.py:100-166``
    (letterbox-to-square geometry, CLAHE text enhancement, padded crop,
    /255 normalization); device-side equivalents for the hot path live
    in ``vtd_tpu.ops.preprocess`` / ``vtd_tpu.ops.crop``.
    """

    @staticmethod
    def resize_with_aspect_ratio(
        image: np.ndarray, target_size: int = 640
    ) -> Tuple[np.ndarray, float]:
        scale, nw, nh, x0, y0 = letterbox_geometry(*image.shape[:2], target_size)
        canvas = np.zeros((target_size, target_size, 3), np.uint8)
        canvas[y0:y0 + nh, x0:x0 + nw] = cv2.resize(
            image, (nw, nh), interpolation=cv2.INTER_AREA
        )
        return canvas, scale

    @staticmethod
    def enhance_text_regions(image: np.ndarray) -> np.ndarray:
        """Adaptive-histogram contrast boost + salt-noise removal on the
        luma channel; color inputs get the enhanced luma broadcast back
        over all three channels (the reference's grayscale-overwrite
        behavior, preprocessing.py:119-141)."""
        try:
            luma = image if image.ndim == 2 else cv2.cvtColor(
                image, cv2.COLOR_BGR2GRAY
            )
            clahe = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8))
            cleaned = cv2.medianBlur(clahe.apply(luma), 3)
            if image.ndim == 2:
                return cleaned
            return np.repeat(cleaned[..., None], image.shape[2], axis=2)
        except Exception as e:
            logger.error("Image enhancement failed: %s", e)
            return image

    @staticmethod
    def crop_text_region(
        image: np.ndarray, bbox: List[int], padding: int = 5
    ) -> np.ndarray:
        """bbox crop grown by ``padding`` px, clamped to the frame."""
        try:
            grow = np.asarray([-padding, -padding, padding, padding])
            limit = np.asarray(image.shape[:2][::-1] * 2)  # (w, h, w, h)
            x1, y1, x2, y2 = np.clip(np.asarray(bbox) + grow, 0, limit)
            return image[y1:y2, x1:x2]
        except Exception as e:
            logger.error("Text region cropping failed: %s", e)
            return image

    @staticmethod
    def normalize_image(image: np.ndarray) -> np.ndarray:
        return np.multiply(image, np.float32(1 / 255.0), dtype=np.float32)

    @staticmethod
    def denormalize_image(image: np.ndarray) -> np.ndarray:
        return np.asarray(image * 255.0, dtype=np.uint8)


class AnnotationProcessor:
    """DBNet training-label generation on the host.

    Same label semantics as reference ``preprocessing.py:168-208``
    (probability map = 1 inside each bbox; threshold map = regions
    shrunk about their centroid by ``shrink_ratio``). The probability
    map is built as one vectorized inside-box test over all boxes — the
    same formulation as the batched on-device version in
    ``vtd_tpu.train.labels.make_maps`` — instead of per-box slice
    painting.
    """

    @staticmethod
    def create_probability_map(
        image_shape: Tuple[int, int], bboxes: List[List[int]]
    ) -> np.ndarray:
        height, width = image_shape
        if not len(bboxes):
            return np.zeros((height, width), np.float32)
        b = np.asarray(bboxes, np.int64).reshape(-1, 4)[:, :, None, None]
        ys, xs = np.ogrid[:height, :width]
        inside = (
            (xs >= b[:, 0]) & (xs < b[:, 2]) & (ys >= b[:, 1]) & (ys < b[:, 3])
        )
        return inside.any(axis=0).astype(np.float32)

    @staticmethod
    def create_threshold_map(
        prob_map: np.ndarray, shrink_ratio: float = 0.4
    ) -> np.ndarray:
        """Fill each foreground region's outline shrunk about its
        centroid. Region outlines come from OpenCV (the label contract
        is defined by its contour extraction); the shrink is a single
        affine contraction of the contour point set."""
        out = np.zeros_like(prob_map)
        contours, _ = cv2.findContours(
            np.asarray(prob_map * 255, np.uint8),
            cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE,
        )
        for c in contours:
            pts = c.reshape(-1, 2).astype(np.float64)
            centroid = pts.mean(axis=0, keepdims=True)
            shrunk = centroid + (pts - centroid) * (1.0 - shrink_ratio)
            cv2.fillPoly(out, [shrunk.astype(np.int32)], 1.0)
        return out

    @staticmethod
    def _shrink_polygon(polygon: np.ndarray, ratio: float) -> np.ndarray:
        """Affine contraction of a polygon about its centroid."""
        pts = np.asarray(polygon, np.float64)
        centroid = pts.mean(axis=0, keepdims=True)
        return centroid + (pts - centroid) * (1.0 - ratio)
