"""Box utilities: IoU, NMS, and cross-frame text-region merging.

The reference has no NMS (its contours are disjoint by construction),
but the TPU postprocess can emit near-duplicate components when a text
region fragments, and the multi-frame engine needs temporal dedup of
*regions* (the reference only dedups exact transcript strings in the
summary, ``pipeliine.py:194-198``). All ops are static-shape [K] with
valid masks, jit-friendly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def iou_matrix(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] x [M, 4] (x1, y1, x2, y2) -> [N, M] IoU."""
    ax1, ay1, ax2, ay2 = (boxes_a[:, i:i + 1] for i in range(4))  # [N,1]
    bx1, by1, bx2, by2 = (boxes_b[None, :, i] for i in range(4))  # [1,M]
    ix1 = jnp.maximum(ax1, bx1)
    iy1 = jnp.maximum(ay1, by1)
    ix2 = jnp.minimum(ax2, bx2)
    iy2 = jnp.minimum(ay2, by2)
    inter = jnp.maximum(ix2 - ix1, 0) * jnp.maximum(iy2 - iy1, 0)
    area_a = jnp.maximum(ax2 - ax1, 0) * jnp.maximum(ay2 - ay1, 0)
    area_b = jnp.maximum(bx2 - bx1, 0) * jnp.maximum(by2 - by1, 0)
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, 1e-9)


@partial(jax.jit, static_argnames=())
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: jnp.ndarray | float = 0.5,
) -> jnp.ndarray:
    """Greedy NMS over [K] boxes; returns a keep mask [K].

    Static shape: iterates K times with masking (no dynamic output).
    """
    k = boxes.shape[0]
    order_scores = jnp.where(valid, scores, -jnp.inf)
    iou = iou_matrix(boxes, boxes)

    def body(i, carry):
        keep, alive = carry
        # pick the highest-score box still alive
        s = jnp.where(alive, order_scores, -jnp.inf)
        best = jnp.argmax(s)
        best_alive = s[best] > -jnp.inf
        # OR-update: when nothing is alive argmax returns 0 and must not
        # clobber an earlier keep decision for slot 0.
        keep = keep.at[best].set(keep[best] | best_alive)
        # kill overlapping boxes (including best itself)
        overlap = iou[best] >= iou_threshold
        alive = alive & ~(overlap & best_alive) & (jnp.arange(k) != best)
        return keep, alive

    keep = jnp.zeros((k,), bool)
    keep, _ = jax.lax.fori_loop(0, k, body, (keep, valid))
    return keep


def temporal_dedup(frame_results, iou_threshold: float = 0.7):
    """Host-side: merge detections of the same text in overlapping
    positions across consecutive frames into tracks.

    frame_results: list of per-frame dicts ({'frame_number',
    'detections': [...]}) — the pipeline's wire format. Returns a list
    of track dicts: {'text', 'first_frame', 'last_frame', 'count',
    'bbox', 'max_detection_confidence', 'max_recognition_confidence'}.
    """
    import numpy as np

    tracks = []  # each: dict + np bbox of last sighting
    for fr in frame_results:
        fn = fr["frame_number"]
        for det in fr["detections"]:
            bbox = np.asarray(det["bbox"], np.float32)
            text = det["text"].strip()
            if not text:
                continue
            matched = None
            for tr in tracks:
                if tr["text"] != text or fn - tr["last_frame"] > 3:
                    continue
                a, b = tr["_bbox"], bbox
                ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
                ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
                inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
                union = (
                    (a[2] - a[0]) * (a[3] - a[1])
                    + (b[2] - b[0]) * (b[3] - b[1])
                    - inter
                )
                if union > 0 and inter / union >= iou_threshold:
                    matched = tr
                    break
            if matched is None:
                tracks.append(
                    {
                        "text": text,
                        "first_frame": fn,
                        "last_frame": fn,
                        "count": 1,
                        "_bbox": bbox,
                        "max_detection_confidence": det[
                            "detection_confidence"
                        ],
                        "max_recognition_confidence": det[
                            "recognition_confidence"
                        ],
                    }
                )
            else:
                matched["last_frame"] = fn
                matched["count"] += 1
                matched["_bbox"] = bbox
                matched["max_detection_confidence"] = max(
                    matched["max_detection_confidence"],
                    det["detection_confidence"],
                )
                matched["max_recognition_confidence"] = max(
                    matched["max_recognition_confidence"],
                    det["recognition_confidence"],
                )
    out = []
    for tr in tracks:
        tr = dict(tr)
        tr["bbox"] = [int(v) for v in tr.pop("_bbox")]
        out.append(tr)
    return out
