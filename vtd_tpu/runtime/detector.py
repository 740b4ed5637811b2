"""Batched TPU text detector.

API parity with the reference ``TextDetector`` (reference
``app/ml/models/text_detector.py:88-178``): ``detect(image, thresh) ->
[{bbox, confidence, polygon}]``. The engine underneath is completely
different — one jitted device program fuses preprocess -> DBNet forward
-> DB postprocess for a whole static-shape frame batch, so a frame
crosses the PCIe/ICI boundary once as uint8 and only tiny [K] result
arrays come back. The reference runs batch=1 per frame with two
host<->device crossings and CPU OpenCV postprocessing (SURVEY.md §3.3).
"""
from __future__ import annotations

import logging
import pickle
from functools import partial
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import settings
from ..models.dbnet import DBNet
from ..ops.db_postprocess import db_postprocess, extract_detections
from ..ops.preprocess import preprocess_frames

logger = logging.getLogger(__name__)


class TextDetector:
    """DBNet detector with a fused, batched device path."""

    def __init__(
        self,
        model_path: Optional[str] = None,
        input_size: int = 640,
        max_dets: int = 64,
        max_box_frac: float = 0.95,
        dtype: jnp.dtype = jnp.bfloat16,
        seed: int = 0,
        transfer_format: str = "bgr",
    ):
        self.input_size = input_size
        self.max_dets = max_dets
        # near-full-frame border-artifact filter; 1.0 disables
        self.max_box_frac = max_box_frac
        # "yuv420" ships frames I420-packed (half the bytes of BGR —
        # worth ~20 ms/frame on a ~30 MB/s relayed host link; neutral on
        # PCIe) and unpacks on device, same as the pipeline's default
        # video transfer. BGR->I420 is chroma-lossy; a trained
        # detector's maps are unaffected (see test_detector_yuv420).
        if transfer_format not in ("bgr", "yuv420"):
            raise ValueError(f"unknown transfer_format {transfer_format!r}")
        self.transfer_format = transfer_format
        self.model = DBNet(dtype=dtype)
        if model_path:
            self.variables = self.load_model(model_path)
        else:
            dummy = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy
            )
        self._thr_cache: Dict[float, Any] = {}
        self._detect_jit = self._build_detect_fn()

    # ------------------------------------------------------------------
    def load_model(self, model_path: str):
        """Load checkpoint: orbax dir, pickled variables, or torch .pth
        (``{'model_state_dict': ...}`` layout, text_detector.py:106-113)
        via the weight importer."""
        p = Path(model_path)
        try:
            if p.suffix in (".pth", ".pt"):
                from ..models.import_torch import import_dbnet_pth

                variables = import_dbnet_pth(model_path)
            elif p.is_dir():
                from ..train.checkpoint import restore_variables

                variables = restore_variables(model_path)
            else:
                with open(model_path, "rb") as f:
                    variables = pickle.load(f)
            # Restored trees are host numpy arrays; without an explicit
            # device_put every jitted call re-uploads ALL params per
            # dispatch (catastrophic through a slow host<->device link).
            return jax.device_put(variables)
        except Exception as e:
            logger.error("Failed to load model: %s", e)
            raise

    def save_model(self, model_path: str):
        with open(model_path, "wb") as f:
            pickle.dump(jax.device_get(self.variables), f)

    # ------------------------------------------------------------------
    def _build_detect_fn(self):
        model = self.model
        size = self.input_size
        max_dets = self.max_dets
        max_box_frac = self.max_box_frac

        @partial(jax.jit, static_argnames=())
        def run(variables, frames_u8, thresh):
            if frames_u8.ndim == 3:  # I420-packed [B, H*3/2, W]
                from ..ops.preprocess import yuv420_to_bgr

                frames_u8 = yuv420_to_bgr(frames_u8)
            x = preprocess_frames(frames_u8, out_size=size)
            out = model.apply(variables, x)
            prob = out["probability"][..., 0]  # [B, S, S] f32

            post = jax.vmap(
                lambda p: db_postprocess(
                    p, thresh, max_dets=max_dets,
                    max_box_frac=max_box_frac,
                )
            )(prob)
            return post

        @jax.jit
        def run_packed(variables, frames_u8, thresh):
            # ONE f16-bitcast uint8 tensor for the serving path: each
            # fetched array pays a host round trip (~9 arrays in the
            # post dict), which dominates single-frame latency on
            # relayed links. Layout [B, K, 28] = f16 boxes(4) +
            # polygon(8) + score(1) + valid(1) — all extract_detections
            # needs.
            post = run(variables, frames_u8, thresh)
            b = frames_u8.shape[0]
            det16 = jnp.concatenate(
                [
                    post["boxes"],
                    post["polygons"].reshape(b, max_dets, 8),
                    post["scores"][..., None],
                    post["valid"].astype(jnp.float32)[..., None],
                ],
                axis=-1,
            ).astype(jnp.float16)
            return jax.lax.bitcast_convert_type(
                det16, jnp.uint8
            ).reshape(b, max_dets, 28)

        self._detect_packed = run_packed
        return run

    # ------------------------------------------------------------------
    def _ship(self, frames: np.ndarray) -> np.ndarray:
        """Apply the transfer format: BGR [B,H,W,3] -> I420-packed
        [B, H*3/2, W] when configured (already-packed input passes
        through)."""
        if self.transfer_format != "yuv420" or frames.ndim == 3:
            return frames
        import cv2

        return np.stack(
            [cv2.cvtColor(f, cv2.COLOR_BGR2YUV_I420) for f in frames]
        )

    def detect_batch_arrays(
        self, frames: np.ndarray, confidence_threshold: float = 0.5
    ) -> Dict[str, jnp.ndarray]:
        """[B, H, W, 3] u8 -> fixed-size device result arrays.

        Thresholding semantics: the reference binarizes the probability
        map at ``confidence_threshold`` (text_detector.py:144).
        """
        thr = self._thr(confidence_threshold)
        return self._detect_jit(
            self.variables, jnp.asarray(self._ship(frames)), thr
        )

    def _thr(self, confidence_threshold: float):
        """Cached device scalar for a threshold — a fresh 4-byte upload
        per call costs a host-link round trip. Bounded (thresholds are
        client-supplied floats); eviction drops the oldest half but
        keeps hot entries rather than clearing everything."""
        thr = self._thr_cache.get(confidence_threshold)
        if thr is None:
            if len(self._thr_cache) >= 64:
                for key in list(self._thr_cache)[:32]:
                    del self._thr_cache[key]
            thr = jax.device_put(jnp.float32(confidence_threshold))
            self._thr_cache[confidence_threshold] = thr
        return thr

    def detect_batch(
        self, frames: np.ndarray, confidence_threshold: float = 0.5
    ) -> List[List[Dict[str, Any]]]:
        """[B, H, W, 3] u8 (or I420-packed [B, H*3/2, W]) -> per-frame
        lists of detection dicts."""
        if frames.ndim == 3:
            b, h15, w = frames.shape
            h = (h15 * 2) // 3
        else:
            b, h, w = frames.shape[:3]
        thr = self._thr(confidence_threshold)
        pack = np.asarray(
            jax.device_get(
                self._detect_packed(
                    self.variables, jnp.asarray(self._ship(frames)), thr
                )
            )
        )
        det16 = np.ascontiguousarray(pack).view(np.float16).astype(np.float32)
        return [
            extract_detections(
                {
                    "boxes": det16[i, :, 0:4],
                    "polygons": det16[i, :, 4:12].reshape(-1, 4, 2),
                    "scores": det16[i, :, 12],
                    "valid": det16[i, :, 13] > 0.5,
                },
                w, h, self.input_size,
            )
            for i in range(b)
        ]

    def detect(
        self, image: np.ndarray, confidence_threshold: float = 0.5
    ) -> List[Dict[str, Any]]:
        """Single-frame parity API (text_detector.py:115-141)."""
        try:
            return self.detect_batch(image[None], confidence_threshold)[0]
        except Exception as e:
            logger.error("Detection failed: %s", e)
            return []
