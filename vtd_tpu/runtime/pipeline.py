"""VideoTextPipeline — the end-to-end video OCR engine.

API parity with the reference pipeline (reference
``app/ml/inference/pipeliine.py:17-210``): ``process_video`` (async,
progress callback, summary dict), ``process_single_frame``, and the same
result dict layouts. The execution model is rebuilt TPU-first:

  reference (SURVEY.md §3.3)                 this engine
  ------------------------------             -------------------------------
  4-thread pool, detector batch=1/frame  ->  one jitted program per frame
  2 host<->device crossings per frame        batch: preprocess + DBNet +
  CPU OpenCV postprocess                     DB postprocess + crop, fused
  per-crop Python recognize loop         ->  selected-crop gather + one
                                             static-shape recognizer call
  frame-at-a-time decode                 ->  threaded decode prefetching
                                             fixed-size uint8 batches

Static shapes throughout: [B] frames x [K] max detections; recognition
runs on gathered valid crops in fixed chunks of M, so nothing ever
recompiles after the first batch.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.schemas import summarize
from ..obs import metrics as _metrics
from ..ops.crop import crop_and_resize_boxes_mm as crop_and_resize_boxes
from ..ops.db_postprocess import db_postprocess
from ..ops.preprocess import preprocess_frames
from ..video.processor import VideoProcessor
from .detector import TextDetector
from .recognizer import TextRecognizer

logger = logging.getLogger(__name__)

# Largest detector input size whose pixel coordinates survive the f16
# transfer pack exactly enough; beyond it the det block packs as f32.
# The binding value is the POLYGON corners, which reach size*sqrt(2)
# for rotated boxes: keeping them under 1024 (f16 quantum 0.5, max
# rounding error 0.25 px) bounds the per-corner error at 0.25 px —
# 1024//sqrt(2) = 724.
_F16_SAFE_INPUT = 724


def _dedup_summary(all_results: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Temporal-dedup summary fields: cross-frame text tracks (same
    string at an overlapping position in nearby frames becomes one
    track) with singleton fragments filtered — a 1-character string
    seen in a single frame is far more likely postprocess noise than
    real scene text.
    """
    from ..ops.nms import temporal_dedup as merge_tracks

    tracks = merge_tracks(all_results)
    confirmed = [
        t for t in tracks if t["count"] >= 2 or len(t["text"]) >= 2
    ]
    texts = sorted({t["text"] for t in confirmed})
    return {
        "text_tracks": confirmed,
        "detected_texts": texts,
        "unique_texts": len(texts),
    }


class VideoTextPipeline:
    def __init__(
        self,
        detector_path: Optional[str] = None,
        recognizer_path: Optional[str] = None,
        use_transformer_ocr: bool = True,
        confidence_threshold: float = 0.5,
        min_recognition_confidence: float = 0.0,
        batch_size: int = 16,
        max_dets: int = 64,
        max_box_frac: float = 0.95,
        target_fps: float = 10.0,
        rec_chunk: Optional[int] = None,
        rec_budget: Optional[int] = None,
        detector_input_size: int = 640,
        host_downscale: Optional[int] = None,
        transfer_format: str = "bgr",
        recognizer_kwargs: Optional[Dict[str, Any]] = None,
        temporal_dedup: bool = False,
        profile_dir: Optional[str] = None,
        sample_mode: str = "stride",
        decode_workers: int = 1,
        pipeline_depth: int = 3,
        decode_backend: str = "auto",
        preserve_aspect: bool = True,
        mesh: Optional[Any] = None,
        parallel_mode: str = "fused",
    ):
        self.detector = TextDetector(
            detector_path, input_size=detector_input_size, max_dets=max_dets
        )
        self.recognizer = TextRecognizer(
            recognizer_path,
            use_transformer=use_transformer_ocr,
            **(recognizer_kwargs or {}),
        )
        self.video_processor = VideoProcessor()

        # CRNN path: recognize only this many (valid, score)-prioritized
        # crop slots per batch instead of all B*K. None = the default
        # heuristic max(2*max_dets, B*K/4); pass B*K (or a huge int) to
        # recognize every slot unconditionally. Batches whose valid
        # detections exceed the budget emit the extras with empty
        # transcripts and log a warning (see _process_batch).
        if rec_budget is not None and parallel_mode == "two_stage":
            raise ValueError(
                "rec_budget is not supported with parallel_mode="
                "'two_stage' (the two-stage runner recognizes every "
                "slot); drop the knob or use the fused mode"
            )
        self.rec_budget = rec_budget
        self._rec_budget_warned = False
        self._fv_cache: Dict[bytes, Any] = {}
        self.confidence_threshold = confidence_threshold
        # Output filter on OCR confidence. Default 0.0 = reference
        # parity: the reference's hardcoded 0.95 TrOCR confidence
        # (text_recognizer.py:64) means its 0.5 default never filters;
        # raising this drops low-confidence transcripts from results.
        self.min_recognition_confidence = min_recognition_confidence
        self.batch_size = batch_size
        self.max_dets = max_dets
        # Frame-filling-box filter (ops/db_postprocess.py): 0.95 drops
        # border artifacts; 1.0 disables (raw parity / random-weight
        # smoke runs, where a whole-map response is legitimate output).
        self.max_box_frac = max_box_frac
        self.target_fps = target_fps
        # Host-side resize before upload: with a 640 detector input the
        # device never needs full-res pixels except for crop sampling,
        # so shipping (downscale x downscale) frames cuts H2D bandwidth
        # by (H*W)/downscale^2 at a small crop-resolution cost.
        self.host_downscale = host_downscale
        # 'yuv420' ships I420-packed frames (half the bytes of BGR) and
        # converts on device (ops/preprocess.yuv420_to_bgr).
        self.transfer_format = transfer_format
        # Aspect-preserving transfer: ship (w*s, h*s) with
        # s = min(1, host_downscale/max(w, h)) instead of a square — for
        # 16:9 sources this cuts host->device bytes a further 1.78x; the
        # device performs the final squash to the square detector input
        # (reference semantics: squash-resize to 640x640,
        # text_detector.py:99-104), so detector-input content is the
        # same modulo one extra bilinear resample.
        self.preserve_aspect = preserve_aspect
        # Batches kept in flight between dispatch and collection; >1 lets
        # the dispatch-time async result copies land before collect.
        self.pipeline_depth = max(1, int(pipeline_depth))
        # Cross-frame text-track merging in the summary (the reference
        # only set-dedups exact strings, pipeliine.py:194-198).
        self.temporal_dedup = temporal_dedup
        # Opt-in jax.profiler trace around the hot loop (SURVEY §5).
        self.profile_dir = profile_dir
        # 'keyframe' ships only scene-change frames to the device and
        # propagates each keyframe's detections to the near-duplicate
        # candidates it covers (video/processor.extract_frame_batches).
        self.sample_mode = sample_mode
        # >1 decodes contiguous video segments concurrently — decode is
        # the 1080p bottleneck and cv2 is single-threaded per capture.
        self.decode_workers = decode_workers
        # 'native' = libav C++ decode tier (scale+convert fused into
        # swscale); 'auto' prefers it and falls back to cv2.
        self.decode_backend = decode_backend
        self.use_transformer = use_transformer_ocr
        if use_transformer_ocr:
            tc = self.recognizer.transformer.cfg
            self.crop_hw = (tc.image_size, tc.width)
            self.rec_chunk = rec_chunk or self.recognizer.transformer.pad_batch
        else:
            self.crop_hw = (32, 128)
            self.rec_chunk = rec_chunk or self.recognizer.pad_batch
        # Detection coords ride the packed uint8 transfer bitcast from
        # float16, exact to ~0.25 px at the default 640 map scale; at
        # input sizes >1024 the f16 quantum reaches >=0.5 px, so the det
        # block silently switches to float32 (doubles only the ~30-byte
        # det block per slot — the ids tail dominates the pack anyway).
        self._pack_np = (
            np.float32
            if detector_input_size > _F16_SAFE_INPUT
            else np.float16
        )
        self._thr_cache: Dict[float, Any] = {}
        # Multi-chip inference: a jax.sharding.Mesh data-shards every
        # frame batch over the mesh's data axis (SURVEY §2.3 row 1 —
        # "frames sharded over chips with pjit on a data axis"; the
        # reference scales GPU workers via k8s replicas instead,
        # k8s/deployment.yaml:127-189). Params replicate / tp-shard per
        # parallel.sharding rules and GSPMD partitions the whole fused
        # program, postprocess and crop included (both are per-frame
        # vmaps, so they shard cleanly with zero collectives until the
        # final output gather).
        self.mesh = mesh
        if parallel_mode not in ("fused", "two_stage"):
            raise ValueError(f"unknown parallel_mode {parallel_mode!r}")
        if parallel_mode == "two_stage" and mesh is not None:
            raise ValueError(
                "mesh (data parallel) and parallel_mode='two_stage' are "
                "mutually exclusive; two_stage builds its own stage "
                "meshes"
            )
        self.parallel_mode = parallel_mode
        if mesh is not None:
            self._apply_mesh(mesh)
        if parallel_mode == "two_stage":
            # Pipeline parallelism (SURVEY §2.3 PP): detector stage on
            # one chip group, recognizer on the other, same wire format.
            from ..parallel.pipeline import TwoStagePipeline

            self._detect_crop = TwoStagePipeline(
                self.detector,
                self.recognizer,
                use_transformer=self.use_transformer,
                max_dets=self.max_dets,
                crop_hw=self.crop_hw,
                max_box_frac=self.max_box_frac,
            )
            for g in self._detect_crop.group_sizes:
                if self.batch_size % g != 0:
                    raise ValueError(
                        f"batch_size {self.batch_size} not divisible by "
                        f"two-stage device groups "
                        f"{self._detect_crop.group_sizes}"
                    )
        else:
            self._detect_crop = self._build_detect_crop()
        # Lazily-compiled full-budget variant of the fused program: the
        # overflow second pass for text-dense batches (see
        # _process_batch); never built unless a batch actually
        # overflows. Once one batch overflows, the pipeline latches to
        # the full-budget program for all future dispatches.
        self._detect_crop_full = None
        self._full_budget_latched = False
        self._recognize_sel = self._build_recognize_sel()

    # ------------------------------------------------------------------
    def _apply_mesh(self, mesh) -> None:
        from ..core.mesh import DATA_AXIS
        from ..parallel.sharding import shard_variables

        n_data = int(mesh.shape[DATA_AXIS])
        if self.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size {self.batch_size} not divisible by the "
                f"mesh data axis ({n_data})"
            )
        self.detector.variables = shard_variables(
            self.detector.variables, mesh
        )
        if self.use_transformer:
            tr = self.recognizer.transformer
            tr.variables = shard_variables(tr.variables, mesh)
        else:
            self.recognizer.crnn_variables = shard_variables(
                self.recognizer.crnn_variables, mesh
            )

    # ------------------------------------------------------------------
    def _build_detect_crop(self, full_budget: bool = False):
        """One fused device program per frame batch.

        detect -> postprocess -> crop every slot -> (CRNN path only)
        recognize the top-``rec_budget`` slots + CTC-reduce, all inside
        a single jit: one dispatch and one small host transfer per
        batch, zero host-side decisions in the hot loop (the per-crop
        Python loop is the reference's biggest cost, SURVEY.md §3.3).

        ``full_budget=True`` builds the recognize-every-slot variant
        used as the second pass when a text-dense batch overflows the
        recognition budget (the reference recognizes every crop,
        ``app/ml/inference/pipeliine.py:117-133`` — overflow must not
        drop transcripts).
        """
        model = self.detector.model
        size = self.detector.input_size
        max_dets = self.max_dets
        max_box_frac = self.max_box_frac
        out_h, out_w = self.crop_hw
        transformer_norm = self.use_transformer
        crnn = None if self.use_transformer else self.recognizer.crnn

        @jax.jit
        def run(variables, rec_variables, frames_u8, thresh, frame_valid):
            if frames_u8.ndim == 3:  # I420-packed [B, H*3/2, W]
                from ..ops.preprocess import yuv420_to_bgr

                frames_u8 = yuv420_to_bgr(frames_u8)
            b, h, w = frames_u8.shape[:3]
            x = preprocess_frames(frames_u8, out_size=size)
            prob = model.apply(variables, x)["probability"][..., 0]
            post = jax.vmap(
                lambda p: db_postprocess(
                    p, thresh, max_dets=max_dets,
                    max_box_frac=max_box_frac,
                )
            )(prob)
            # Padding frames (batch tails duplicate the last real frame)
            # must not produce valid slots: they would consume
            # recognition-budget places from real detections and inflate
            # the packed valid column the host then has to re-filter.
            post["valid"] = post["valid"] & frame_valid[:, None]
            scale = jnp.asarray([w / size, h / size, w / size, h / size])
            boxes_orig = post["boxes"] * scale
            crops = jax.vmap(
                lambda f, bx, v: crop_and_resize_boxes(
                    f, bx, v, out_h=out_h, out_w=out_w
                )
            )(frames_u8, boxes_orig, post["valid"])
            crops = crops.reshape((b * max_dets, out_h, out_w, 3))

            # Pack ALL host-bound outputs into ONE small uint8 tensor:
            # every fetched array pays a host<->device round trip, and on
            # a relayed link the effective bandwidth for fresh results is
            # ~1 MB/s, so the transfer byte count directly sets the
            # serving-loop period. float16 keeps pixel coordinates exact
            # to ~0.25 px at the 640-input scale (the host rounds boxes
            # to ints anyway) and CTC vocab ids fit a byte.
            # Layout per slot (uint8): f16-bitcast dets [28 or 30 bytes]
            # = boxes(4) + polygon(8) + score(1) + valid(1)
            #   [+ ctc confidence(1) on the CRNN path]; then ids(T).
            det_cols = [
                post["boxes"],
                post["polygons"].reshape(b, max_dets, 8),
                post["scores"][..., None],
                post["valid"].astype(jnp.float32)[..., None],
            ]
            pack_dt = jnp.dtype(self._pack_np)
            if transformer_norm:
                det16 = jnp.concatenate(det_cols, -1).astype(pack_dt)
                det_bytes = jax.lax.bitcast_convert_type(
                    det16, jnp.uint8
                ).reshape(b, max_dets, -1)
                # BGR [0,1] -> RGB, mean/std 0.5 (TrOCR processor norm)
                crops = (crops[..., ::-1] - 0.5) / 0.5
                return det_bytes, crops
            from ..ops.ctc import ctc_greedy_decode_arrays

            bk = b * max_dets
            budget = bk if full_budget else self._effective_rec_budget(b)
            if budget < bk:
                # Typical batches fill a handful of the B*K slots; the
                # CRNN pass over all of them was ~1/4 of the fused
                # program. Recognize only the top-``budget`` slots by
                # (valid, score) priority — a [BK] top_k plus one
                # block-gather of crops — and scatter results back into
                # the full slot layout. Slots past the budget (only
                # possible when >budget detections land in one batch)
                # keep blank transcripts; bump ``rec_budget`` for
                # text-dense video.
                key = (
                    post["valid"].reshape(bk).astype(jnp.float32) * 2.0
                    + post["scores"].reshape(bk)
                )
                sel = jax.lax.top_k(key, budget)[1]
                ctc_r = ctc_greedy_decode_arrays(
                    crnn.apply(rec_variables, crops[sel])
                )
                t_len = ctc_r["ids"].shape[-1]
                ctc = {
                    "confidence": jnp.zeros((bk,), jnp.float32)
                    .at[sel].set(ctc_r["confidence"]),
                    "ids": jnp.zeros((bk, t_len), ctc_r["ids"].dtype)
                    .at[sel].set(ctc_r["ids"]),
                }
            else:
                ctc = ctc_greedy_decode_arrays(
                    crnn.apply(rec_variables, crops)
                )
            det_cols.append(ctc["confidence"].reshape(b, max_dets, 1))
            det16 = jnp.concatenate(det_cols, -1).astype(pack_dt)
            det_bytes = jax.lax.bitcast_convert_type(
                det16, jnp.uint8
            ).reshape(b, max_dets, -1)
            ids_u8 = ctc["ids"].reshape(b, max_dets, -1).astype(jnp.uint8)
            out_pack = jnp.concatenate([det_bytes, ids_u8], axis=-1)
            # Crops are already recognized on-device; do NOT return them
            # (dead outputs still occupy HBM until the handle drops).
            return (out_pack,)

        return run

    def _frame_valid_dev(self, valid_frames, b: int):
        """[B] bool frame-validity mask on device, cached per pattern —
        a fresh 8-byte upload per dispatch would cost a host-link round
        trip; a video produces at most two patterns (full batches + one
        tail)."""
        arr = (
            np.ones(b, bool) if valid_frames is None
            else np.asarray(valid_frames, bool)
        )
        key = arr.tobytes()
        dev = self._fv_cache.get(key)
        if dev is None:
            if len(self._fv_cache) >= 32:
                self._fv_cache.clear()
            if self.mesh is not None:
                from ..parallel.sharding import batch_sharding

                dev = jax.device_put(arr, batch_sharding(self.mesh, 1))
            else:
                dev = jax.device_put(arr)
            self._fv_cache[key] = dev
        return dev

    def _effective_rec_budget(self, b: int) -> int:
        """Recognized crop slots per b-frame batch on the CRNN path —
        the single source of truth for the fused program AND the
        host-side over-budget warning."""
        bk = b * self.max_dets
        return min(bk, self.rec_budget or max(2 * self.max_dets, bk // 4))

    def _build_recognize_sel(self):
        if self.use_transformer:
            tr = self.recognizer.transformer
            gather = jax.jit(lambda crops, sel: crops[sel])

            def run(crops_flat, sel_np):
                sel_crops = gather(crops_flat, jnp.asarray(sel_np))
                return tr.recognize_crops_device(sel_crops)

            return run

        crnn = self.recognizer.crnn
        from ..ops.ctc import ctc_greedy_decode_arrays, ids_to_text

        @jax.jit
        def kernel(variables, crops, sel):
            return ctc_greedy_decode_arrays(crnn.apply(variables, crops[sel]))

        def run(crops_flat, sel_np):
            arrs = jax.device_get(
                kernel(
                    self.recognizer.crnn_variables,
                    crops_flat,
                    jnp.asarray(sel_np),
                )
            )
            return ids_to_text(arrs["ids"], arrs["emit"]), arrs["confidence"]

        return run

    # ------------------------------------------------------------------
    def ship_dims(self, video_info: Dict[str, Any]):
        """Transfer dims for one video: ``host_downscale`` square by
        default; with ``preserve_aspect``, the source aspect at
        max-dim = ``host_downscale`` and never upscaled (multiples of 8
        for the I420 plane layout and clean XLA tiling). Returns the
        ``resize_to`` argument for ``extract_frame_batches`` (None =
        ship source resolution)."""
        ds = self.host_downscale
        if not ds:
            return None
        if not self.preserve_aspect:
            return ds
        w0 = int(video_info.get("width", 0) or 0)
        h0 = int(video_info.get("height", 0) or 0)
        if w0 <= 0 or h0 <= 0:
            return ds
        s = min(1.0, ds / max(w0, h0))
        ship_w = max(8, int(round(w0 * s / 8)) * 8)
        ship_h = max(8, int(round(h0 * s / 8)) * 8)
        return (ship_w, ship_h)

    # ------------------------------------------------------------------
    def _dispatch_batch(
        self,
        frames: np.ndarray,
        confidence_threshold: Optional[float] = None,
        valid_frames: Optional[np.ndarray] = None,
        full_budget: bool = False,
    ):
        """Enqueue the fused device program (non-blocking: JAX dispatch
        is async, so the TPU crunches this batch while the host decodes
        the next one).

        ``confidence_threshold`` overrides the instance default per call
        (it is a traced scalar, so no recompile) — concurrent jobs with
        different thresholds must not mutate shared pipeline state.
        ``valid_frames``: [B] bool marking real (non-padding) frames;
        None means all real.
        """
        thr = (
            self.confidence_threshold
            if confidence_threshold is None
            else confidence_threshold
        )
        rec_vars = (
            None if self.use_transformer else self.recognizer.crnn_variables
        )
        # The threshold is a traced scalar; materialize it on device ONCE
        # per distinct value — a fresh 4-byte upload per dispatch costs a
        # full host-link round trip (~30 ms on a relayed link).
        dev_thr = self._thr_cache.get(thr)
        if dev_thr is None:
            # Thresholds are client-supplied per request: bound the
            # cache or arbitrary distinct floats pin device scalars
            # forever on a long-lived server.
            if len(self._thr_cache) >= 64:
                self._thr_cache.clear()
            if self.parallel_mode == "two_stage":
                from jax.sharding import NamedSharding, PartitionSpec as P

                dev_thr = jax.device_put(
                    jnp.float32(thr),
                    NamedSharding(self._detect_crop.mesh_a, P()),
                )
            elif self.mesh is not None:
                from ..core.mesh import replicated

                dev_thr = jax.device_put(
                    jnp.float32(thr), replicated(self.mesh)
                )
            else:
                dev_thr = jax.device_put(jnp.float32(thr))
            self._thr_cache[thr] = dev_thr
        if self.mesh is not None:
            from ..parallel.sharding import batch_sharding

            frames_dev = jax.device_put(
                np.asarray(frames), batch_sharding(self.mesh, frames.ndim)
            )
        elif self.parallel_mode == "two_stage":
            frames_dev = frames  # stage-A placement happens in the runner
        else:
            frames_dev = jnp.asarray(frames)
        if self.parallel_mode == "two_stage":
            # The two-stage runner keeps the 4-arg contract; padding
            # frames are filtered host-side as before.
            handles = self._detect_crop(
                self.detector.variables, rec_vars, frames_dev, dev_thr
            )
        else:
            prog = self._detect_crop
            if full_budget or self._full_budget_latched:
                # Overflow second pass / latched mode: recognize EVERY
                # slot. Built and compiled only when a batch actually
                # overflows.
                if self._detect_crop_full is None:
                    self._detect_crop_full = self._build_detect_crop(
                        full_budget=True
                    )
                prog = self._detect_crop_full
            handles = prog(
                self.detector.variables,
                rec_vars,
                frames_dev,
                dev_thr,
                self._frame_valid_dev(valid_frames, len(frames)),
            )
        # Start the device->host copy of the packed outputs as soon as
        # the program finishes, so by the time process_batch blocks on
        # device_get the bytes are already in flight (or landed).
        try:
            handles[0].copy_to_host_async()
        except AttributeError:
            pass
        return handles

    def _parse_pack(self, out_pack: np.ndarray, b: int) -> Dict[str, Any]:
        """Decode the fused program's packed uint8 output — the single
        place the wire layout is known host-side (det f16/f32 block:
        boxes(4) + polygon(8) + score(1) + valid(1) [+ ctc conf(1) on
        the CRNN path], then uint8 CTC ids)."""
        nf16 = 14 if self.use_transformer else 15
        itemsize = np.dtype(self._pack_np).itemsize
        det16 = np.ascontiguousarray(
            out_pack[..., : itemsize * nf16]
        ).view(self._pack_np).astype(np.float32)
        ctc = None
        if not self.use_transformer:  # CTC rode the same pack
            ids = out_pack[..., itemsize * nf16:].reshape(
                b * self.max_dets, -1
            ).astype(np.int32)
            from ..ops.ctc import emit_mask_np

            ctc = {
                "ids": ids,
                "emit": emit_mask_np(ids),
                "confidence": det16[..., 14].reshape(-1),
            }
        return {
            "boxes": det16[..., 0:4],
            "polys": det16[..., 4:12].reshape(b, self.max_dets, 4, 2),
            "scores": det16[..., 12],
            "valid": det16[..., 13] > 0.5,
            "ctc": ctc,
        }

    def _process_batch(
        self, frames: np.ndarray, valid_frames: np.ndarray, handles=None,
        orig_size=None, confidence_threshold: Optional[float] = None,
        min_recognition_confidence: Optional[float] = None,
    ) -> List[List[Dict[str, Any]]]:
        """One frame batch -> per-frame lists of recognized-region dicts.

        ``orig_size``: true (h, w) of the source when ``frames`` were
        host-downscaled; detection coordinates scale back to it.
        """
        if frames.ndim == 3:  # I420-packed
            b, h15, w = frames.shape
            h = (h15 * 2) // 3
        else:
            b, h, w = frames.shape[:3]
        if orig_size is not None:
            h, w = orig_size
        size = self.detector.input_size
        t0 = time.perf_counter()
        if handles is None:
            handles = self._dispatch_batch(
                frames, valid_frames=valid_frames,
                confidence_threshold=confidence_threshold
            )
        # CRNN path returns (out_pack,); transformer path (det_bytes,
        # crops). Either way the first handle is the uint8 byte pack.
        out_pack, crops_flat = (
            handles if len(handles) == 2 else (handles[0], None)
        )
        out_pack = np.asarray(jax.device_get(out_pack))
        parsed = self._parse_pack(out_pack, b)

        if parsed["ctc"] is not None and self.parallel_mode != "two_stage":
            # CRNN path: slots beyond the recognition budget carry blank
            # transcripts. The reference recognizes every crop
            # (pipeliine.py:117-133), so an overflowing text-dense batch
            # is re-dispatched through the full-budget variant of the
            # fused program — and from then on the pipeline LATCHES to
            # that program for future dispatches, so a text-dense video
            # pays the double pass exactly once, not per batch.
            n_valid = int(np.count_nonzero(parsed["valid"]))
            budget = self._effective_rec_budget(b)
            if n_valid > budget and not self._full_budget_latched:
                if not self._rec_budget_warned:
                    self._rec_budget_warned = True
                    logger.warning(
                        "batch has %d valid detections but the "
                        "recognition budget is %d: recovering via a "
                        "full-budget second pass and latching to the "
                        "full-budget program (the first such batch pays "
                        "its compile). Raise rec_budget (up to "
                        "batch_size*max_dets) to avoid the one-time "
                        "cost.",
                        n_valid, budget,
                    )
                self._full_budget_latched = True
                full = self._dispatch_batch(
                    frames, confidence_threshold=confidence_threshold,
                    valid_frames=valid_frames, full_budget=True,
                )
                # The second pack is AUTHORITATIVE for everything —
                # boxes, validity, and transcripts. The recompiled
                # program could disagree with pass 1 at probability-
                # threshold boundaries, and mixing passes would attach
                # transcripts to the wrong detections.
                out_pack = np.asarray(jax.device_get(full[0]))
                parsed = self._parse_pack(out_pack, b)

        boxes = parsed["boxes"]
        polys = parsed["polys"]
        scores = parsed["scores"]
        valid = parsed["valid"]
        ctc = parsed["ctc"]
        sx, sy = w / size, h / size

        # Vectorized slot filter (the Python loop over B*K slots was a
        # measurable cost on dense frames): scale to original coords,
        # apply the reference's >10px size filter (text_detector.py:166).
        bx = (boxes * np.asarray([sx, sy, sx, sy])).astype(np.int64)
        size_ok = (bx[..., 2] - bx[..., 0] > 10) & (
            bx[..., 3] - bx[..., 1] > 10
        )
        keep = valid & size_ok & np.asarray(valid_frames)[:, None]
        need_ij = np.argwhere(keep)  # [N, 2]
        need: List[int] = (
            need_ij[:, 0] * self.max_dets + need_ij[:, 1]
        ).tolist()
        polys_int = np.round(polys).astype(int)
        meta: Dict[int, Dict[str, Any]] = {}
        for (i, j), flat in zip(need_ij, need):
            meta[flat] = {
                "frame": int(i),
                "bbox": bx[i, j].tolist(),
                "detection_confidence": float(scores[i, j]),
                "polygon": polys_int[i, j].tolist(),
            }

        texts: Dict[int, Any] = {}
        if ctc is not None:
            from ..ops.ctc import ids_to_text

            if need:
                sel = np.asarray(need)
                decoded = ids_to_text(ctc["ids"][sel], ctc["emit"][sel])
                for k, flat in enumerate(need):
                    texts[flat] = (decoded[k], float(ctc["confidence"][flat]))
        else:
            # Transformer path: autoregressive decode is too heavy to run
            # on all slots; recognize the needed crops in fixed chunks.
            m = self.rec_chunk
            for c0 in range(0, len(need), m):
                chunk = need[c0:c0 + m]
                sel = np.zeros(m, np.int32)
                sel[: len(chunk)] = chunk
                t, conf = self._recognize_sel(crops_flat, sel)
                _metrics.recognizer_chunk_occupancy.observe(len(chunk) / m)
                for k, flat in enumerate(chunk):
                    texts[flat] = (t[k], float(conf[k]))

        # SURVEY §5: the reference declared these histograms but never
        # recorded them from its pipeline; here every batch feeds them.
        _metrics.metrics_collector.record_model_inference(
            time.perf_counter() - t0,
            "transformer" if self.use_transformer else "DBNet-CRNN",
            b,
        )
        min_rconf = (
            self.min_recognition_confidence
            if min_recognition_confidence is None
            else min_recognition_confidence
        )
        results: List[List[Dict[str, Any]]] = [[] for _ in range(b)]
        for flat in need:
            info = meta[flat]
            text, rconf = texts[flat]
            if rconf < min_rconf:
                continue
            results[info["frame"]].append(
                {
                    "bbox": info["bbox"],
                    "text": text,
                    "detection_confidence": info["detection_confidence"],
                    "recognition_confidence": rconf,
                    "polygon": info["polygon"],
                }
            )
        return results

    # ------------------------------------------------------------------
    # Public batch API (used by runtime.engine and external batchers —
    # e.g. a caller staging device-resident frames): dispatch_batch
    # enqueues the fused device program and returns opaque handles;
    # process_batch turns a batch (or its pre-dispatched handles) into
    # per-frame detection lists.
    def dispatch_batch(
        self,
        frames: np.ndarray,
        confidence_threshold: Optional[float] = None,
        valid_frames: Optional[np.ndarray] = None,
    ):
        """Asynchronously enqueue the fused detect→postprocess→crop→
        recognize program for one fixed-size frame batch; returns opaque
        device handles to pass to :meth:`process_batch`. Non-blocking —
        dispatch batch k+1 before collecting batch k to overlap host and
        device work. ``valid_frames``: [B] bool marking real
        (non-padding) frames, None = all real."""
        return self._dispatch_batch(
            frames, confidence_threshold=confidence_threshold,
            valid_frames=valid_frames,
        )

    def process_batch(
        self,
        frames: np.ndarray,
        valid_frames: np.ndarray,
        handles=None,
        orig_size=None,
        confidence_threshold: Optional[float] = None,
        min_recognition_confidence: Optional[float] = None,
    ) -> List[List[Dict[str, Any]]]:
        """One frame batch -> per-frame lists of recognized-region dicts
        (the pipeline wire format). ``handles``: output of a prior
        :meth:`dispatch_batch` for these frames; when None the batch is
        dispatched synchronously here. ``orig_size``: true (h, w) of the
        source when ``frames`` were host-downscaled."""
        return self._process_batch(
            frames, valid_frames, handles=handles, orig_size=orig_size,
            confidence_threshold=confidence_threshold,
            min_recognition_confidence=min_recognition_confidence,
        )

    # ------------------------------------------------------------------
    async def process_video(
        self,
        video_path: str,
        output_dir: str = "",
        progress_callback: Optional[Callable] = None,
        resume_file: Optional[str] = None,
        confidence_threshold: Optional[float] = None,
        min_recognition_confidence: Optional[float] = None,
        temporal_dedup: Optional[bool] = None,
        sample_mode: Optional[str] = None,
    ) -> Dict[str, Any]:
        """Process a whole video (parity: pipeliine.py:34-91).

        Differences from the reference, both intended-behavior fixes:
        progress is measured against the number of frames that *will be
        extracted* (the reference divides extracted count by the source
        frame count, so progress tops out at target_fps/src_fps); and
        detection/recognition run batched on device.

        ``resume_file``: checkpoint/resume of a partially processed
        video — the reference restarts a retried job from frame 0
        (SURVEY.md §5). When set, each completed batch's frame results
        are appended as JSON lines; on restart, frames already present
        are loaded and skipped.

        ``confidence_threshold``/``temporal_dedup`` override the instance
        defaults per call (concurrent jobs must not mutate shared state).
        """
        import json as _json
        from contextlib import nullcontext

        thr = (
            self.confidence_threshold
            if confidence_threshold is None
            else confidence_threshold
        )
        dedup = self.temporal_dedup if temporal_dedup is None else temporal_dedup
        mode = self.sample_mode if sample_mode is None else sample_mode
        profile_ctx = (
            jax.profiler.trace(self.profile_dir)
            if self.profile_dir
            else nullcontext()
        )
        ckpt_fh = None
        try:
            start_time = time.time()
            video_info = self.video_processor.get_video_info(video_path)
            if not video_info:
                raise ValueError(f"Cannot open video: {video_path}")

            done_frames: Dict[int, Dict[str, Any]] = {}
            if resume_file:
                import os as _os

                if _os.path.exists(resume_file):
                    with open(resume_file) as fh:
                        for line in fh:
                            try:
                                rec = _json.loads(line)
                                done_frames[rec["frame_number"]] = rec
                            except ValueError:
                                continue  # torn write from a crash
                ckpt_fh = open(resume_file, "a")

            src_fps = video_info.get("fps", 0) or 0
            total_src = video_info.get("frame_count", 0)
            interval = (
                max(1, int(src_fps / self.target_fps)) if src_fps > 0 else 1
            )
            total_expected = (
                (total_src + interval - 1) // interval if total_src else 0
            )

            all_results: List[Dict[str, Any]] = []
            frame_count = 0

            # Software pipeline: keep `pipeline_depth` batches in flight
            # so host decode, host assembly, TPU compute, AND the
            # device->host result copies (started at dispatch) all
            # overlap; by collection time a batch's byte pack has
            # usually already landed on the host. Upload + dispatch run
            # in their own thread: the 5 MB host->device copy and the
            # dispatch RPCs release the GIL while they wait, so they
            # overlap decode and assembly instead of serializing with
            # them on the collect thread.
            import asyncio as _asyncio
            import queue as _queue
            import threading as _threading

            batches = self.video_processor.extract_frame_batches(
                video_path,
                batch_size=self.batch_size,
                target_fps=self.target_fps,
                resize_to=self.ship_dims(video_info),
                pixel_format=self.transfer_format,
                sample_mode=mode,
                decode_workers=self.decode_workers,
                decode_backend=self.decode_backend,
            )
            # frame_number -> detections of keyframes, for propagation to
            # the near-duplicate candidates each keyframe covers.
            kf_detections: Dict[int, List[Dict[str, Any]]] = {}

            async def collect(batch, handles):
                nonlocal frame_count
                per_frame = (
                    self._process_batch(
                        batch["frames"], batch["valid"], handles=handles,
                        orig_size=batch.get("orig_size"),
                        confidence_threshold=thr,
                        min_recognition_confidence=min_recognition_confidence,
                    )
                    if handles is not None
                    else None
                )
                nvalid = (
                    int(batch["valid"].sum())
                    if batch.get("frames") is not None
                    else 0
                )
                for i in range(nvalid):
                    fn = int(batch["frame_numbers"][i])
                    if per_frame is None:
                        rec = done_frames[fn]  # restored from checkpoint
                    else:
                        rec = {
                            "frame_number": fn,
                            "timestamp": float(batch["timestamps"][i]),
                            "detections": per_frame[i],
                        }
                        if ckpt_fh is not None:
                            ckpt_fh.write(_json.dumps(rec) + "\n")
                    kf_detections[fn] = rec["detections"]
                    all_results.append(rec)
                # Keyframe mode: each near-duplicate candidate inherits
                # its keyframe's detections (the diff gate certified the
                # downsampled frames are visually identical), so results
                # still cover every stride candidate the reference would
                # have processed — without paying device work for it.
                for fn, ts, ref in batch.get("dups") or []:
                    if fn in done_frames:
                        rec = done_frames[fn]
                    else:
                        rec = {
                            "frame_number": int(fn),
                            "timestamp": float(ts),
                            "detections": [
                                dict(d) for d in kf_detections.get(ref, [])
                            ],
                            "duplicate_of": int(ref),
                        }
                        if ckpt_fh is not None:
                            ckpt_fh.write(_json.dumps(rec) + "\n")
                    all_results.append(rec)
                    frame_count += 1
                if ckpt_fh is not None and per_frame is not None:
                    ckpt_fh.flush()
                frame_count += nvalid
                if progress_callback:
                    progress = (
                        frame_count / total_expected if total_expected else 0
                    )
                    await progress_callback(
                        progress, frame_count, total_expected
                    )

            dispatch_q: _queue.Queue = _queue.Queue(
                maxsize=self.pipeline_depth
            )
            stop_evt = _threading.Event()

            def dispatcher():
                try:
                    for batch in batches:
                        already_done = batch.get("frames") is None or all(
                            int(fn) in done_frames
                            for fn, v in zip(
                                batch["frame_numbers"], batch["valid"]
                            )
                            if v
                        )
                        # valid_frames must ride along: without it the
                        # fused program treats tail-padding duplicates as
                        # real frames and they consume rec_budget slots
                        # that belong to real detections.
                        handles = (
                            None if already_done
                            else self._dispatch_batch(
                                batch["frames"], confidence_threshold=thr,
                                valid_frames=batch["valid"],
                            )
                        )
                        while not stop_evt.is_set():
                            try:
                                dispatch_q.put((batch, handles), timeout=0.1)
                                break
                            except _queue.Full:
                                continue
                        if stop_evt.is_set():
                            return
                    dispatch_q.put(None)
                except BaseException as e:  # surfaced on the collect side
                    dispatch_q.put(e)

            with profile_ctx:
                disp_t = _threading.Thread(target=dispatcher, daemon=True)
                disp_t.start()
                loop = _asyncio.get_event_loop()
                try:
                    while True:
                        item = await loop.run_in_executor(
                            None, dispatch_q.get
                        )
                        if item is None:
                            break
                        if isinstance(item, BaseException):
                            raise item
                        await collect(*item)
                finally:
                    stop_evt.set()
                    while not dispatch_q.empty():
                        try:
                            dispatch_q.get_nowait()
                        except _queue.Empty:
                            break
            # Keyframe propagation appends dups after their keyframe's
            # batch, and parallel segment decode interleaves batches
            # across segments — restore canonical frame order.
            all_results.sort(key=lambda r: r["frame_number"])
            processing_time = time.time() - start_time
            summary = summarize(all_results, processing_time, frame_count)
            if dedup:
                summary.update(_dedup_summary(all_results))
            return {
                "status": "success",
                "results": all_results,
                "summary": summary,
                "video_info": video_info,
            }
        except InterruptedError:
            # Cooperative cancellation from the progress callback (the
            # serving task raises it when its job is revoked): propagate
            # so the caller can record "cancelled" — swallowing it into
            # a failed-dict made cancelled jobs report as failures.
            raise
        except Exception as e:
            logger.error("Video processing failed: %s", e)
            return {"status": "failed", "error": str(e), "results": []}
        finally:
            # Close on EVERY path: an exception mid-run must still flush
            # buffered checkpoint records — they are exactly what the
            # retry will resume from — and a long-lived server must not
            # leak one fd per failed resumable job.
            if ckpt_fh is not None:
                ckpt_fh.close()

    # ------------------------------------------------------------------
    def process_single_frame(
        self,
        frame: np.ndarray,
        confidence_threshold: Optional[float] = None,
    ) -> Dict[str, Any]:
        """Single-frame parity API (pipeliine.py:143-172)."""
        try:
            per_frame = self._process_batch(
                frame[None], np.asarray([True]),
                confidence_threshold=confidence_threshold,
            )
            dets = [
                {k: v for k, v in d.items() if k != "polygon"}
                for d in per_frame[0]
            ]
            return {"detections": dets}
        except Exception as e:
            logger.error("Single frame processing failed: %s", e)
            return {"detections": [], "error": str(e)}
