"""Two-stage pipeline parallelism: detect on one chip group, recognize
on another.

The reference's two-stage structure (detect -> recognize,
SURVEY.md §2.3 "Pipeline parallel") maps onto disjoint device groups:
the detector (+postprocess+crop) runs data-parallel over group A while
the recognizer consumes the previous batch's crops on group B. JAX's
async dispatch provides the overlap — group A starts batch k+1 as soon
as its inputs are enqueued, while group B still works on batch k — and
the crop tensors hop groups via ``device_put`` (ICI on real hardware).

This is not an orphan demo: :class:`TwoStagePipeline` implements the
same program contract as ``VideoTextPipeline._build_detect_crop`` —
``run(det_vars, rec_vars, frames_u8, thresh) -> handles`` with the
identical packed-uint8 output layout — so
``VideoTextPipeline(parallel_mode="two_stage")`` swaps it in for the
fused single-program path and everything downstream (engine, serving,
exports) works unchanged. Both recognizer engines are supported: the
CRNN path packs CTC results on group B; the transformer path stages
crops onto group B where the KV-cache decode runs.

The data-parallel mesh (``VideoTextPipeline(mesh=...)``,
parallel/sharding.py) remains the primary scaling story — frames are
embarrassingly parallel — but when the two model stages have very
different arithmetic intensity, splitting chips lets each stage run at
its own batch cadence.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


class TwoStagePipeline:
    """Detector stage on ``devices[:split]``, recognizer stage on the
    rest; frames data-sharded within each group.

    Callable with the fused-program signature
    ``(det_vars, rec_vars, frames_u8, thresh)`` (the variables
    arguments are accepted for signature parity; the stage-resident
    copies placed at construction are what execute). Returns
    ``(out_pack,)`` on the CRNN path / ``(det_bytes, crops_b)`` on the
    transformer path — byte-identical layouts to
    ``VideoTextPipeline._build_detect_crop``.
    """

    def __init__(
        self,
        detector,
        recognizer,
        use_transformer: bool = False,
        devices: Optional[Sequence[jax.Device]] = None,
        split: Optional[int] = None,
        max_dets: int = 64,
        crop_hw: Tuple[int, int] = (32, 128),
        max_box_frac: float = 0.95,
    ):
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < 2:
            raise ValueError("pipeline parallelism needs >= 2 devices")
        split = split if split is not None else len(devices) // 2
        self.group_sizes = (split, len(devices) - split)
        self.mesh_a = Mesh(np.asarray(devices[:split]), ("data",))
        self.mesh_b = Mesh(np.asarray(devices[split:]), ("data",))
        self.detector = detector
        self.recognizer = recognizer
        self.use_transformer = use_transformer
        self.max_dets = max_dets
        self.crop_hw = crop_hw
        self.max_box_frac = max_box_frac

        repl_a = NamedSharding(self.mesh_a, P())
        repl_b = NamedSharding(self.mesh_b, P())
        self._det_vars = jax.device_put(detector.variables, repl_a)
        if use_transformer:
            # The transformer runtime's own jitted decode must run on
            # group B: place its params there (recognize_crops_device
            # reads them from the runtime object).
            tr = recognizer.transformer
            tr.variables = jax.device_put(tr.variables, repl_b)
            self._rec_vars = None
        else:
            self._rec_vars = jax.device_put(
                recognizer.crnn_variables, repl_b
            )

        from ..ops.crop import crop_and_resize_boxes_mm
        from ..ops.db_postprocess import db_postprocess
        from ..ops.preprocess import preprocess_frames, yuv420_to_bgr

        size = detector.input_size
        model = detector.model
        out_h, out_w = crop_hw
        k = max_dets
        # Same pack-precision rule as the fused program (keep in sync
        # with runtime/pipeline._F16_SAFE_INPUT): rotated-polygon
        # corners reach size*sqrt(2), so f16 holds the 0.25 px error
        # bound only up to size 724.
        from ..runtime.pipeline import _F16_SAFE_INPUT

        pack_dt = jnp.float32 if size > _F16_SAFE_INPUT else jnp.float16

        @jax.jit
        def stage_a(variables, frames_u8, thresh):
            if frames_u8.ndim == 3:  # I420-packed [B, H*3/2, W]
                frames_u8 = yuv420_to_bgr(frames_u8)
            b, h, w = frames_u8.shape[:3]
            x = preprocess_frames(frames_u8, out_size=size)
            prob = model.apply(variables, x)["probability"][..., 0]
            post = jax.vmap(
                lambda p: db_postprocess(
                    p, thresh, max_dets=k, max_box_frac=max_box_frac
                )
            )(prob)
            scale = jnp.asarray([w / size, h / size, w / size, h / size])
            crops = jax.vmap(
                lambda f, bx, v: crop_and_resize_boxes_mm(
                    f, bx, v, out_h=out_h, out_w=out_w
                )
            )(frames_u8, post["boxes"] * scale, post["valid"])
            # Same det column order as the fused pack: boxes(4) +
            # polygon(8) + score(1) + valid(1).
            det14 = jnp.concatenate(
                [
                    post["boxes"],
                    post["polygons"].reshape(b, k, 8),
                    post["scores"][..., None],
                    post["valid"].astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
            crops = crops.reshape(b * k, out_h, out_w, 3)
            if use_transformer:
                det16 = det14.astype(pack_dt)
                det_bytes = jax.lax.bitcast_convert_type(
                    det16, jnp.uint8
                ).reshape(b, k, -1)
                # BGR [0,1] -> RGB, mean/std 0.5 (TrOCR processor norm)
                crops = (crops[..., ::-1] - 0.5) / 0.5
                return det_bytes, crops
            return det14, crops

        if not use_transformer:
            from ..ops.ctc import ctc_greedy_decode_arrays

            crnn = recognizer.crnn

            @jax.jit
            def stage_b(variables, det14, crops):
                b = det14.shape[0]
                ctc = ctc_greedy_decode_arrays(crnn.apply(variables, crops))
                det16 = jnp.concatenate(
                    [det14, ctc["confidence"].reshape(b, k, 1)], axis=-1
                ).astype(pack_dt)
                det_bytes = jax.lax.bitcast_convert_type(
                    det16, jnp.uint8
                ).reshape(b, k, -1)
                ids_u8 = ctc["ids"].reshape(b, k, -1).astype(jnp.uint8)
                return jnp.concatenate([det_bytes, ids_u8], axis=-1)

            self._stage_b = stage_b

        self._stage_a = stage_a
        self._repl_b = repl_b

    # ------------------------------------------------------------------
    def _thr_on_a(self, thresh):
        """Threshold scalar committed to group A (a scalar committed to
        any other device would conflict with the sharded inputs)."""
        if isinstance(thresh, (float, int)):
            return jax.device_put(
                jnp.float32(thresh), NamedSharding(self.mesh_a, P())
            )
        return thresh  # caller-cached, already on mesh_a

    def __call__(self, det_vars, rec_vars, frames_u8, thresh):
        frames_np = np.asarray(frames_u8)
        shard_a = NamedSharding(
            self.mesh_a, P("data", *([None] * (frames_np.ndim - 1)))
        )
        fa = jax.device_put(frames_np, shard_a)
        out_a = self._stage_a(self._det_vars, fa, self._thr_on_a(thresh))
        if self.use_transformer:
            det_bytes, crops = out_a
            # hop stages: group A -> group B (ICI transfer on hardware);
            # the decode itself runs lazily in recognize_sel on group B.
            crops_b = jax.device_put(
                crops,
                NamedSharding(self.mesh_b, P("data", None, None, None)),
            )
            return det_bytes, crops_b
        det14, crops = out_a
        det14_b = jax.device_put(det14, self._repl_b)
        crops_b = jax.device_put(
            crops, NamedSharding(self.mesh_b, P("data", None, None, None))
        )
        out_pack = self._stage_b(self._rec_vars, det14_b, crops_b)
        return (out_pack,)

    # ------------------------------------------------------------------
    def run_batches(self, batches: List[np.ndarray], thresh: float = 0.5):
        """Process frame batches through both stages with async-dispatch
        pipelining; returns per-batch packed host arrays (the raw wire
        format — ``VideoTextPipeline.process_batch`` is the integrated
        consumer that turns these into detection dicts)."""
        handles = [self(None, None, frames, thresh) for frames in batches]
        return [
            tuple(np.asarray(jax.device_get(h)) for h in hs)
            for hs in handles
        ]

    def stage_devices(self) -> Tuple[List[str], List[str]]:
        return (
            [str(d) for d in self.mesh_a.devices.flatten()],
            [str(d) for d in self.mesh_b.devices.flatten()],
        )
