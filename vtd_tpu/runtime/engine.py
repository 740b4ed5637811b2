"""Multi-stream inference engine: async micro-batching across videos.

The reference achieves multi-video concurrency with N Celery worker
replicas, one GPU each, batch=1 per frame (SURVEY.md §2.3). On TPU the
equivalent is ONE engine per chip that interleaves frames from many
streams into the same fused device program: a scheduler thread collects
frames (grouped by resolution, since shapes are static), pads to the
engine batch size, dispatches, and resolves per-frame futures.

This is BASELINE.json config #5: "multi-stream concurrent videos with
async micro-batching".
"""
from __future__ import annotations

import logging
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from .pipeline import VideoTextPipeline

logger = logging.getLogger(__name__)


class InferenceEngine:
    def __init__(
        self,
        pipeline: Optional[VideoTextPipeline] = None,
        max_wait_ms: float = 20.0,
        **pipeline_kwargs,
    ):
        self.pipeline = pipeline or VideoTextPipeline(**pipeline_kwargs)
        self.batch_size = self.pipeline.batch_size
        self.max_wait = max_wait_ms / 1000.0
        # key = (frame.shape, orig_size) -> bucketed micro-batches
        self._q: "queue.Queue[Tuple[Tuple, np.ndarray, Future]]" = (
            queue.Queue()
        )
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------
    def submit_frame(
        self, frame: np.ndarray, orig_size: Optional[Tuple[int, int]] = None
    ) -> Future:
        """Enqueue one frame; resolves to the frame's detection list
        (pipeline wire format).

        ``frame`` is either a raw BGR frame (host-downscaled here before
        dispatch, legacy path) or, when ``orig_size`` is given, a frame
        already in the pipeline's transfer format (ship dims + pixel
        format — what ``extract_frame_batches`` emits); detections scale
        back to ``orig_size``. Frames are bucketed by (shape, orig_size)
        so streams of different resolutions never share a batch with
        mismatched coordinate scaling."""
        fut: Future = Future()
        if self._stop.is_set():
            fut.set_exception(RuntimeError("engine is closed"))
            return fut
        self._q.put(((frame.shape, orig_size), frame, fut))
        return fut

    def submit_batch(
        self,
        frames: np.ndarray,
        valid: np.ndarray,
        orig_size: Optional[Tuple[int, int]] = None,
    ) -> Future:
        """Enqueue one pre-stacked frame batch; resolves to the full
        per-slot list of detection lists (index with ``valid``).

        Throughput path: a decoder that already produces engine-sized
        batches (``extract_frame_batches``) skips per-frame queueing,
        bucketing, and one Future per frame — measured ~20% aggregate
        fps on 3-stream VOD (config 5), where per-frame submission made
        the multi-stream path slower than the single-stream one."""
        fut: Future = Future()
        if self._stop.is_set():
            fut.set_exception(RuntimeError("engine is closed"))
            return fut
        self._q.put(("__batch__", (frames, valid, orig_size), fut))
        return fut

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)
        # The loop flushes everything it has seen on exit; fail whatever
        # raced into the queue after that so no waiter hangs forever.
        while True:
            try:
                _, _, fut = self._q.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                fut.set_exception(RuntimeError("engine closed"))

    # ------------------------------------------------------------------
    def _loop(self):
        from collections import deque

        buckets: Dict[Tuple, List[Tuple[np.ndarray, Future]]] = {}
        deadline: Dict[Tuple, float] = {}
        # Software pipeline: dispatch is async, so keep pipeline_depth
        # batches in flight and only block on the oldest — a synchronous
        # process_batch per micro-batch stalled the scheduler (and every
        # decoder feeding it) through a full device round trip.
        inflight: deque = deque()
        depth = getattr(self.pipeline, "pipeline_depth", 2)
        while not self._stop.is_set():
            try:
                shape, frame, fut = self._q.get(timeout=self.max_wait / 2)
                if shape == "__batch__":
                    # pre-stacked batch: dispatch straight away, no
                    # bucketing/deadline machinery
                    dispatched = self._dispatch_stacked(*frame, fut)
                    if dispatched is not None:
                        inflight.append(dispatched)
                else:
                    buckets.setdefault(shape, []).append((frame, fut))
                    deadline.setdefault(shape, time.time() + self.max_wait)
            except queue.Empty:
                # idle tick: no new frames, drain in-flight results
                while inflight:
                    self._finish_batch(*inflight.popleft())
            now = time.time()
            for key in list(buckets):
                items = buckets[key]
                if len(items) >= self.batch_size or (
                    items and now >= deadline[key]
                ):
                    batch = items[: self.batch_size]
                    buckets[key] = items[self.batch_size:]
                    if buckets[key]:
                        deadline[key] = now + self.max_wait
                    else:
                        del buckets[key]
                        del deadline[key]
                    dispatched = self._dispatch_items(batch, key)
                    if dispatched is not None:
                        inflight.append(dispatched)
            while len(inflight) > depth:
                self._finish_batch(*inflight.popleft())
        # Shutdown flush: dispatch every bucketed frame (don't strand
        # their futures), then drain the in-flight queue.
        for key in list(buckets):
            items = buckets.pop(key)
            while items:
                dispatched = self._dispatch_items(
                    items[: self.batch_size], key
                )
                items = items[self.batch_size:]
                if dispatched is not None:
                    inflight.append(dispatched)
        while inflight:
            self._finish_batch(*inflight.popleft())

    def _dispatch_stacked(self, frames, valid, orig_size, fut: Future):
        """Non-blocking dispatch of a pre-stacked batch; the whole
        batch resolves through ONE future (see :meth:`submit_batch`)."""
        try:
            handles = self.pipeline.dispatch_batch(
                frames, valid_frames=valid
            )
            return fut, frames, valid, orig_size, handles
        except Exception as e:
            logger.exception("engine batch dispatch failed")
            if not fut.done():
                fut.set_exception(e)
            return None

    def _dispatch_items(self, items: List[Tuple[np.ndarray, Future]], key):
        """Stack + enqueue one micro-batch on the device (non-blocking);
        returns state for :meth:`_finish_batch`, or None on failure."""
        try:
            n = len(items)
            _, orig_size = key
            raw = [f for f, _ in items] + [items[-1][0]] * (
                self.batch_size - n
            )
            if orig_size is None:  # legacy raw-BGR submissions
                orig_size = items[0][0].shape[:2]
                ds = self.pipeline.host_downscale
                if ds and orig_size != (ds, ds):
                    import cv2

                    raw = [
                        cv2.resize(
                            f, (ds, ds), interpolation=cv2.INTER_LINEAR
                        )
                        for f in raw
                    ]
            frames = np.stack(raw)
            valid = np.zeros(self.batch_size, bool)
            valid[:n] = True
            handles = self.pipeline.dispatch_batch(
                frames, valid_frames=valid
            )
            return items, frames, valid, orig_size, handles
        except Exception as e:  # resolve futures even on failure
            logger.exception("engine dispatch failed")
            for _, fut in items:
                if not fut.done():
                    fut.set_exception(e)
            return None

    def _finish_batch(self, items, frames, valid, orig_size, handles):
        try:
            per_frame = self.pipeline.process_batch(
                frames, valid, handles=handles, orig_size=orig_size
            )
            if isinstance(items, Future):  # submit_batch path
                items.set_result(per_frame)
            else:
                for i, (_, fut) in enumerate(items):
                    fut.set_result(per_frame[i])
        except Exception as e:
            logger.exception("engine batch failed")
            futs = [items] if isinstance(items, Future) else [
                fut for _, fut in items
            ]
            for fut in futs:
                if not fut.done():
                    fut.set_exception(e)

    # ------------------------------------------------------------------
    def process_videos(
        self, video_paths: List[str], target_fps: float = 10.0
    ) -> Dict[str, Dict[str, Any]]:
        """Process several videos concurrently through one engine.

        Decoders run in parallel threads feeding the shared micro-batch
        queue; results keep per-video frame order.
        """
        from ..core.schemas import summarize

        results: Dict[str, Dict[str, Any]] = {}
        lock = threading.Lock()

        def worker(path: str):
            t0 = time.time()
            vp = self.pipeline.video_processor
            info = vp.get_video_info(path)
            pending: List[Tuple[np.ndarray, np.ndarray, np.ndarray, Future]]
            pending = []
            # Decode in the pipeline's transfer format (downscaled,
            # yuv420 by default) so each stream ships the same compact
            # frames as the single-video path — the full-res BGR legacy
            # path moved ~3.4x the bytes per frame through the batch
            # queue and paid a host resize per frame. Decode in
            # engine-sized batches and submit each whole: one Future and
            # one queue hop per batch instead of per frame (the
            # per-frame path made 3-stream VOD slower than 1-stream).
            for batch in vp.extract_frame_batches(
                path,
                batch_size=self.batch_size,
                target_fps=target_fps,
                resize_to=self.pipeline.ship_dims(info),
                pixel_format=self.pipeline.transfer_format,
                decode_backend=self.pipeline.decode_backend,
            ):
                if batch.get("frames") is None:
                    continue
                pending.append(
                    (
                        batch["frame_numbers"],
                        batch["timestamps"],
                        batch["valid"],
                        self.submit_batch(
                            batch["frames"],
                            batch["valid"],
                            orig_size=batch["orig_size"],
                        ),
                    )
                )
            frames_out = []
            for nums, ts, bvalid, fut in pending:
                per_frame = fut.result(timeout=600)
                for i in np.nonzero(bvalid)[0]:
                    frames_out.append(
                        {
                            "frame_number": int(nums[i]),
                            "timestamp": float(ts[i]),
                            "detections": per_frame[i],
                        }
                    )
            elapsed = time.time() - t0
            with lock:
                results[path] = {
                    "status": "success",
                    "results": frames_out,
                    "summary": summarize(frames_out, elapsed, len(frames_out)),
                    "video_info": info,
                }

        threads = [
            threading.Thread(target=worker, args=(p,)) for p in video_paths
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return results
