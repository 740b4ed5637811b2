"""Two-stage pipeline parallelism: detect on one chip group, recognize
on another.

The reference's two-stage structure (detect -> recognize,
SURVEY.md §2.3 "Pipeline parallel") maps naturally onto disjoint device
groups: the detector (+postprocess+crop) runs data-parallel over group
A while the recognizer consumes the previous batch's crops on group B.
JAX's async dispatch provides the overlap — group A starts batch k+1 as
soon as its inputs are enqueued, while group B still works on batch k —
and the crop tensors hop groups via ``device_put`` (ICI on real
hardware).

This is the optional PP axis from the survey; the data-parallel mesh
(parallel/sharding.py) remains the primary scaling story.
"""
from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


class TwoStagePipeline:
    """Detector stage on ``devices[:split]``, recognizer stage on the
    rest. Frames are data-sharded within each group."""

    def __init__(
        self,
        detector,
        recognizer,
        devices: Optional[Sequence[jax.Device]] = None,
        split: Optional[int] = None,
        max_dets: int = 64,
        crop_hw: Tuple[int, int] = (32, 128),
    ):
        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < 2:
            raise ValueError("pipeline parallelism needs >= 2 devices")
        split = split if split is not None else len(devices) // 2
        self.mesh_a = Mesh(np.asarray(devices[:split]), ("data",))
        self.mesh_b = Mesh(np.asarray(devices[split:]), ("data",))
        self.detector = detector
        self.recognizer = recognizer
        self.max_dets = max_dets
        self.crop_hw = crop_hw

        repl_a = NamedSharding(self.mesh_a, P())
        repl_b = NamedSharding(self.mesh_b, P())
        self._det_vars = jax.device_put(detector.variables, repl_a)
        self._rec_vars = jax.device_put(recognizer.crnn_variables, repl_b)

        from ..ops.crop import crop_and_resize_boxes_mm
        from ..ops.ctc import ctc_greedy_decode_arrays
        from ..ops.db_postprocess import db_postprocess
        from ..ops.preprocess import preprocess_frames

        size = detector.input_size
        model = detector.model
        out_h, out_w = crop_hw
        k = max_dets

        @jax.jit
        def stage_a(variables, frames_u8, thresh):
            b, h, w = frames_u8.shape[:3]
            x = preprocess_frames(frames_u8, out_size=size)
            prob = model.apply(variables, x)["probability"][..., 0]
            post = jax.vmap(lambda p: db_postprocess(p, thresh, max_dets=k))(
                prob
            )
            scale = jnp.asarray([w / size, h / size, w / size, h / size])
            crops = jax.vmap(
                lambda f, bx, v: crop_and_resize_boxes_mm(
                    f, bx, v, out_h=out_h, out_w=out_w
                )
            )(frames_u8, post["boxes"] * scale, post["valid"])
            det_pack = jnp.concatenate(
                [
                    post["boxes"],
                    post["polygons"].reshape(b, k, 8),
                    post["scores"][..., None],
                    post["valid"].astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
            return det_pack, crops.reshape(b * k, out_h, out_w, 3)

        crnn = recognizer.crnn

        @jax.jit
        def stage_b(variables, crops):
            ctc = ctc_greedy_decode_arrays(crnn.apply(variables, crops))
            return ctc["ids"], ctc["confidence"]

        self._stage_a = stage_a
        self._stage_b = stage_b
        self._shard_a = NamedSharding(self.mesh_a, P("data"))
        self._shard_b = NamedSharding(self.mesh_b, P("data"))
        self._repl_b = repl_b

    # ------------------------------------------------------------------
    def run_batches(
        self, batches: List[np.ndarray], thresh: float = 0.5
    ) -> List[Dict[str, Any]]:
        """Process frame batches through both stages with one-batch
        pipelining. Returns per-batch dicts of host arrays."""
        results: List[Dict[str, Any]] = []
        pending = None  # (det_pack_handle, ids_handle, conf_handle)

        def collect(handles):
            det_pack, ids, conf = handles
            results.append(
                {
                    "det_pack": np.asarray(jax.device_get(det_pack)),
                    "ids": np.asarray(jax.device_get(ids)),
                    "confidence": np.asarray(jax.device_get(conf)),
                }
            )

        for frames in batches:
            fa = jax.device_put(frames, self._shard_a)
            det_pack, crops = self._stage_a(
                self._det_vars, fa, jnp.float32(thresh)
            )
            # hop stages: group A -> group B (ICI transfer on hardware)
            crops_b = jax.device_put(crops, self._shard_b)
            ids, conf = self._stage_b(self._rec_vars, crops_b)
            if pending is not None:
                collect(pending)
            pending = (det_pack, ids, conf)
        if pending is not None:
            collect(pending)
        return results

    def stage_devices(self) -> Tuple[List[str], List[str]]:
        return (
            [str(d) for d in self.mesh_a.devices.flatten()],
            [str(d) for d in self.mesh_b.devices.flatten()],
        )
