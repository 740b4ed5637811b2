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


class VideoProcessor:
    """Video metadata probe + fps-throttled frame extraction."""

    def __init__(self):
        # Reference preprocessing.py:13
        self.supported_formats = [".mp4", ".avi", ".mov", ".mkv", ".wmv"]

    def get_video_info(self, video_path: str) -> Dict[str, Any]:
        """Probe fps/frames/size/duration (preprocessing.py:15-41)."""
        try:
            cap = cv2.VideoCapture(video_path)
            if not cap.isOpened():
                raise ValueError(f"Cannot open video: {video_path}")
            fps = cap.get(cv2.CAP_PROP_FPS)
            frame_count = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
            width = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
            height = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
            duration = frame_count / fps if fps > 0 else 0
            cap.release()
            return {
                "fps": fps,
                "frame_count": frame_count,
                "width": width,
                "height": height,
                "duration": duration,
                "format": Path(video_path).suffix.lower(),
            }
        except Exception as e:  # parity: empty dict on failure
            logger.error("Failed to get video info: %s", e)
            return {}

    def extract_frames_at_fps(
        self, video_path: str, target_fps: float = 10
    ) -> Generator[Tuple[np.ndarray, int, float], None, None]:
        """Yield (frame, extracted_index, timestamp) at ~target_fps.

        Stride semantics match the reference (``preprocessing.py:43-72``):
        every ``max(1, int(src_fps / target_fps))``-th decoded frame.
        """
        cap = cv2.VideoCapture(video_path)
        try:
            if not cap.isOpened():
                raise ValueError(f"Cannot open video: {video_path}")
            source_fps = cap.get(cv2.CAP_PROP_FPS)
            interval = max(1, int(source_fps / target_fps)) if source_fps > 0 else 1

            frame_number = 0
            extracted = 0
            while True:
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
                    yield frame, extracted, ts
                    extracted += 1
                frame_number += 1
        except Exception as e:
            logger.error("Frame extraction failed: %s", e)
            return
        finally:
            cap.release()

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
        """Random access to one frame (preprocessing.py:86-98)."""
        try:
            cap = cv2.VideoCapture(video_path)
            cap.set(cv2.CAP_PROP_POS_FRAMES, frame_number)
            ret, frame = cap.read()
            cap.release()
            return frame if ret else None
        except Exception as e:
            logger.error("Single frame extraction failed: %s", e)
            return None

    # ------------------------------------------------------------------
    # TPU-native addition: prefetched fixed-shape batches
    # ------------------------------------------------------------------
    def extract_frame_batches(
        self,
        video_path: str,
        batch_size: int = 8,
        target_fps: float = 10,
        prefetch: int = 2,
        resize_to: Optional[int] = None,
        pixel_format: str = "bgr",
    ) -> Generator[Dict[str, np.ndarray], None, None]:
        """Yield dicts of stacked frames for one device transfer each.

        Every batch has exactly ``batch_size`` frames (the tail is padded
        by repeating the last frame, with ``valid`` marking real slots)
        so the jitted detector never recompiles. Decode runs in a
        daemon thread feeding a bounded queue (``prefetch`` batches deep),
        overlapping CPU decode with TPU compute.

        ``resize_to``: host-side square resize before batching. When the
        detector input is smaller than the source (it is: 640x640), the
        full-res pixels never reach the device path except for crop
        sampling, so shipping ``resize_to``-sized frames cuts host->
        device bandwidth ~(HW / resize_to^2)x; original dims are kept in
        ``orig_size`` so detections scale back exactly.

        ``pixel_format``: 'bgr' ships [B,H,W,3] u8; 'yuv420' ships
        I420-packed [B, H*3/2, W] u8 — half the bytes — and the device
        program converts back to BGR (ops/preprocess.yuv420_to_bgr).

        Yields {'frames': u8 array, 'frame_numbers': [B] i64,
                'timestamps': [B] f64, 'valid': [B] bool,
                'orig_size': (h, w), 'pixel_format': str}.
        """
        q: queue.Queue = queue.Queue(maxsize=max(prefetch, 1))
        stop = threading.Event()

        def producer():
            buf_frames: List[np.ndarray] = []
            buf_nums: List[int] = []
            buf_ts: List[float] = []
            orig_size: List[Tuple[int, int]] = []

            def flush():
                n = len(buf_frames)
                if n == 0:
                    return
                frames = buf_frames + [buf_frames[-1]] * (batch_size - n)
                nums = buf_nums + [buf_nums[-1]] * (batch_size - n)
                ts = buf_ts + [buf_ts[-1]] * (batch_size - n)
                valid = np.zeros(batch_size, bool)
                valid[:n] = True
                q.put(
                    {
                        "frames": np.stack(frames),
                        "frame_numbers": np.asarray(nums, np.int64),
                        "timestamps": np.asarray(ts, np.float64),
                        "valid": valid,
                        "orig_size": orig_size[0],
                        "pixel_format": pixel_format,
                    }
                )
                buf_frames.clear()
                buf_nums.clear()
                buf_ts.clear()

            try:
                for frame, idx, ts in self.extract_frames_at_fps(
                    video_path, target_fps
                ):
                    if stop.is_set():
                        return
                    if not orig_size:
                        orig_size.append(frame.shape[:2])
                    if resize_to is not None and frame.shape[:2] != (
                        resize_to, resize_to,
                    ):
                        frame = cv2.resize(
                            frame, (resize_to, resize_to),
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
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        finally:
            stop.set()
            # drain so the producer can exit a blocking put
            while not q.empty():
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


class ImageProcessor:
    """Host-side image ops (parity: preprocessing.py:100-166).

    Device-side equivalents live in ``vtd_tpu.ops.preprocess``.
    """

    @staticmethod
    def resize_with_aspect_ratio(
        image: np.ndarray, target_size: int = 640
    ) -> Tuple[np.ndarray, float]:
        height, width = image.shape[:2]
        scale = target_size / max(height, width)
        nw, nh = int(width * scale), int(height * scale)
        resized = cv2.resize(image, (nw, nh), interpolation=cv2.INTER_AREA)
        padded = np.zeros((target_size, target_size, 3), dtype=np.uint8)
        y0 = (target_size - nh) // 2
        x0 = (target_size - nw) // 2
        padded[y0:y0 + nh, x0:x0 + nw] = resized
        return padded, scale

    @staticmethod
    def enhance_text_regions(image: np.ndarray) -> np.ndarray:
        """CLAHE + median blur (preprocessing.py:119-141)."""
        try:
            gray = (
                cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
                if image.ndim == 3
                else image
            )
            enhanced = cv2.createCLAHE(clipLimit=3.0, tileGridSize=(8, 8)).apply(
                gray
            )
            denoised = cv2.medianBlur(enhanced, 3)
            if image.ndim == 3:
                out = image.copy()
                out[:, :, 0] = denoised
                out[:, :, 1] = denoised
                out[:, :, 2] = denoised
                return out
            return denoised
        except Exception as e:
            logger.error("Image enhancement failed: %s", e)
            return image

    @staticmethod
    def crop_text_region(
        image: np.ndarray, bbox: List[int], padding: int = 5
    ) -> np.ndarray:
        try:
            x1, y1, x2, y2 = bbox
            h, w = image.shape[:2]
            x1 = max(0, x1 - padding)
            y1 = max(0, y1 - padding)
            x2 = min(w, x2 + padding)
            y2 = min(h, y2 + padding)
            return image[y1:y2, x1:x2]
        except Exception as e:
            logger.error("Text region cropping failed: %s", e)
            return image

    @staticmethod
    def normalize_image(image: np.ndarray) -> np.ndarray:
        return image.astype(np.float32) / 255.0

    @staticmethod
    def denormalize_image(image: np.ndarray) -> np.ndarray:
        return (image * 255.0).astype(np.uint8)


class AnnotationProcessor:
    """DBNet training-label generation (parity: preprocessing.py:168-208).

    A batched pure-JAX variant lives in ``vtd_tpu.train.labels`` for
    on-device label generation during training.
    """

    @staticmethod
    def create_probability_map(
        image_shape: Tuple[int, int], bboxes: List[List[int]]
    ) -> np.ndarray:
        height, width = image_shape
        prob_map = np.zeros((height, width), dtype=np.float32)
        for x1, y1, x2, y2 in bboxes:
            prob_map[y1:y2, x1:x2] = 1.0
        return prob_map

    @staticmethod
    def create_threshold_map(
        prob_map: np.ndarray, shrink_ratio: float = 0.4
    ) -> np.ndarray:
        thresh_map = np.zeros_like(prob_map)
        contours, _ = cv2.findContours(
            (prob_map * 255).astype(np.uint8),
            cv2.RETR_EXTERNAL,
            cv2.CHAIN_APPROX_SIMPLE,
        )
        for contour in contours:
            polygon = contour.reshape(-1, 2)
            shrunk = AnnotationProcessor._shrink_polygon(polygon, shrink_ratio)
            cv2.fillPoly(thresh_map, [shrunk.astype(np.int32)], 1.0)
        return thresh_map

    @staticmethod
    def _shrink_polygon(polygon: np.ndarray, ratio: float) -> np.ndarray:
        cx = np.mean(polygon[:, 0])
        cy = np.mean(polygon[:, 1])
        shrunk = polygon.astype(np.float64).copy()
        shrunk[:, 0] = cx + (polygon[:, 0] - cx) * (1 - ratio)
        shrunk[:, 1] = cy + (polygon[:, 1] - cy) * (1 - ratio)
        return shrunk
