"""On-device DB probability-map postprocessing.

Replaces the reference's CPU OpenCV chain — binarize ->
``cv2.findContours`` -> ``cv2.minAreaRect`` -> ``cv2.boxPoints`` ->
area/size filters -> rescale (reference
``app/ml/models/text_detector.py:143-178``) — with a fully vectorized,
static-shape XLA program that runs on the TPU right after the detector
forward pass, so probability maps never cross back to the host:

1. **Connected components** by iterated 8-neighbor min-label propagation
   with pointer jumping (``label <- label[label]``), which converges in
   O(log diameter) sweeps. Each pixel ends up holding the minimum flat
   index of its component.
2. **Top-K component selection** by area via one ``segment_sum`` over
   the label image and ``lax.top_k`` (K = ``max_dets``, masked ``valid``
   flags instead of dynamic shapes).
3. **Min-area rotated rectangle** per component via rotating calipers:
   project component pixels onto A candidate angles in [0, 90°) and take
   per-component min/max extents with ``segment_min``/``segment_max``;
   the angle minimizing extent area is the min-area rect (up to angle
   quantization), then a per-detection local refinement sharpens the
   angle. The refinement evaluates a *different* angle per detection in
   one pass by gathering each pixel's detection-specific angle.
4. **Confidence** = mean probability inside the axis-aligned box,
   computed O(1) per box from a 2-D integral image (the intended
   semantics of ``text_detector.py:168-170``).

Everything is fixed-shape: outputs are [K] arrays with a ``valid`` mask.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

_NEIGHBOR_SHIFTS = (
    (-1, -1), (-1, 0), (-1, 1),
    (0, -1), (0, 1),
    (1, -1), (1, 0), (1, 1),
)


def connected_components(binary: jnp.ndarray, iters: int = 16) -> jnp.ndarray:
    """8-connected component labels for a [H, W] bool map.

    Returns flat int32 labels [H*W]; each foreground pixel holds the min
    flat index of its component; background pixels hold their own index.
    """
    h, w = binary.shape
    hw = h * w
    big = jnp.int32(hw)
    flat_idx = jnp.arange(hw, dtype=jnp.int32)
    labels = flat_idx  # self-labels; background never participates

    binary_flat = binary.reshape(-1)

    def neighbor_min(lbl_flat):
        l2d = jnp.where(binary, lbl_flat.reshape(h, w), big)
        padded = jnp.pad(l2d, 1, constant_values=hw)
        m = l2d
        for dy, dx in _NEIGHBOR_SHIFTS:
            m = jnp.minimum(m, padded[1 + dy:1 + dy + h, 1 + dx:1 + dx + w])
        out = jnp.where(binary, m, lbl_flat.reshape(h, w))
        return out.reshape(-1)

    def body(_, lbl):
        lbl = neighbor_min(lbl)
        lbl = lbl[lbl]  # pointer jump (path compression)
        lbl = lbl[lbl]
        return lbl

    return jax.lax.fori_loop(0, iters, body, labels)


def _extents_at_angles(xs, ys, det_id, theta, k1):
    """Per-detection projection extents at per-pixel angles theta.

    xs, ys, det_id, theta: [N] arrays (theta already gathered per pixel).
    Returns (umin, umax, vmin, vmax), each [k1].
    """
    c, s = jnp.cos(theta), jnp.sin(theta)
    u = xs * c + ys * s
    v = -xs * s + ys * c
    umin = jax.ops.segment_min(u, det_id, num_segments=k1)
    umax = jax.ops.segment_max(u, det_id, num_segments=k1)
    vmin = jax.ops.segment_min(v, det_id, num_segments=k1)
    vmax = jax.ops.segment_max(v, det_id, num_segments=k1)
    return umin, umax, vmin, vmax


@partial(
    jax.jit,
    static_argnames=(
        "max_dets", "min_area", "num_angles", "refine_steps", "cc_iters",
        "search_stride",
    ),
)
def db_postprocess(
    prob_map: jnp.ndarray,
    bin_thresh: jnp.ndarray | float = 0.5,
    *,
    max_dets: int = 64,
    min_area: float = 100.0,
    num_angles: int = 45,
    refine_steps: int = 9,
    cc_iters: int = 16,
    search_stride: int = 2,
) -> Dict[str, jnp.ndarray]:
    """[H, W] float prob map -> fixed-size detection arrays.

    Returns dict with (all in map coordinate space, e.g. 640x640):
      boxes:    [K, 4] f32 AABB (x1, y1, x2, y2), clamped to map bounds
      polygons: [K, 4, 2] f32 rotated min-area rect corners
      scores:   [K] f32 mean probability inside the AABB
      areas:    [K] f32 component pixel areas
      valid:    [K] bool
    """
    h, w = prob_map.shape
    k = max_dets
    k1 = k + 1  # last slot collects background / non-top-K pixels

    binary = prob_map > bin_thresh
    labels = connected_components(binary, iters=cc_iters)
    binary_flat = binary.reshape(-1)

    areas = jax.ops.segment_sum(
        binary_flat.astype(jnp.float32), labels, num_segments=h * w
    )
    top_areas, top_roots = jax.lax.top_k(areas, k)
    valid = top_areas >= min_area

    slot = jnp.full((h * w,), k, dtype=jnp.int32)
    slot = slot.at[top_roots].set(jnp.arange(k, dtype=jnp.int32))
    det_id = jnp.where(binary_flat, slot[labels], k)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    xs_f, ys_f = xs.reshape(-1), ys.reshape(-1)

    # ---- axis-aligned extents ----
    xmin = jax.ops.segment_min(xs_f, det_id, num_segments=k1)[:k]
    xmax = jax.ops.segment_max(xs_f, det_id, num_segments=k1)[:k]
    ymin = jax.ops.segment_min(ys_f, det_id, num_segments=k1)[:k]
    ymax = jax.ops.segment_max(ys_f, det_id, num_segments=k1)[:k]

    # ---- coarse angle search (strided for speed; angle is robust) ----
    st = search_stride
    det_id_s = det_id.reshape(h, w)[::st, ::st].reshape(-1)
    xs_s = xs[::st, ::st].reshape(-1)
    ys_s = ys[::st, ::st].reshape(-1)

    def coarse_body(j, carry):
        best_area, best_theta = carry
        theta = (jnp.pi / 2) * j / num_angles
        theta_px = jnp.full_like(xs_s, theta)
        umin, umax, vmin, vmax = _extents_at_angles(
            xs_s, ys_s, det_id_s, theta_px, k1
        )
        a = (umax - umin) * (vmax - vmin)
        better = a < best_area
        return (
            jnp.where(better, a, best_area),
            jnp.where(better, theta, best_theta),
        )

    init = (jnp.full((k1,), jnp.inf), jnp.zeros((k1,)))
    _, best_theta = jax.lax.fori_loop(0, num_angles, coarse_body, init)
    best_theta = best_theta[:k]

    # ---- per-detection refinement at full resolution ----
    # Each pixel evaluates its own detection's candidate angle, so one
    # segment pass refines every detection simultaneously.
    coarse_step = (jnp.pi / 2) / num_angles
    best_theta_k1 = jnp.concatenate([best_theta, jnp.zeros((1,))])
    best_area_k1 = jnp.full((k1,), jnp.inf)

    def refine_body(r, carry):
        best_area, best_t = carry
        frac = (r / max(refine_steps - 1, 1)) * 2.0 - 1.0  # [-1, 1]
        delta = frac * coarse_step
        cand = best_theta_k1 + delta  # [k1] candidate per det (fixed base)
        theta_px = cand[det_id]
        umin, umax, vmin, vmax = _extents_at_angles(
            xs_f, ys_f, det_id, theta_px, k1
        )
        a = (umax - umin) * (vmax - vmin)
        better = a < best_area
        return jnp.where(better, a, best_area), jnp.where(better, cand, best_t)

    _, theta_k1 = jax.lax.fori_loop(
        0, refine_steps, refine_body, (best_area_k1, best_theta_k1)
    )

    # ---- final extents + corners at the refined angle ----
    theta_px = theta_k1[det_id]
    umin, umax, vmin, vmax = _extents_at_angles(
        xs_f, ys_f, det_id, theta_px, k1
    )
    theta = theta_k1[:k]
    umin, umax, vmin, vmax = umin[:k], umax[:k], vmin[:k], vmax[:k]

    c, s = jnp.cos(theta), jnp.sin(theta)
    # corners in (u, v) rect space -> rotate back to (x, y)
    uu = jnp.stack([umin, umax, umax, umin], axis=1)  # [K, 4]
    vv = jnp.stack([vmin, vmin, vmax, vmax], axis=1)
    px = uu * c[:, None] - vv * s[:, None]
    py = uu * s[:, None] + vv * c[:, None]
    polygons = jnp.stack([px, py], axis=-1)  # [K, 4, 2]

    # AABB from polygon corners, clamped (text_detector.py:158-162).
    bx1 = jnp.clip(jnp.min(px, axis=1), 0, w)
    by1 = jnp.clip(jnp.min(py, axis=1), 0, h)
    bx2 = jnp.clip(jnp.max(px, axis=1), 0, w)
    by2 = jnp.clip(jnp.max(py, axis=1), 0, h)
    boxes = jnp.stack([bx1, by1, bx2, by2], axis=1)

    # ---- confidence: mean prob inside AABB via integral image ----
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(prob_map, 0), 1), ((1, 0), (1, 0)))
    ix1 = jnp.clip(bx1.astype(jnp.int32), 0, w - 1)
    iy1 = jnp.clip(by1.astype(jnp.int32), 0, h - 1)
    ix2 = jnp.clip(jnp.ceil(bx2).astype(jnp.int32), ix1 + 1, w)
    iy2 = jnp.clip(jnp.ceil(by2).astype(jnp.int32), iy1 + 1, h)
    box_sum = ii[iy2, ix2] - ii[iy1, ix2] - ii[iy2, ix1] + ii[iy1, ix1]
    npix = ((ix2 - ix1) * (iy2 - iy1)).astype(jnp.float32)
    scores = box_sum / jnp.maximum(npix, 1.0)

    # Deterministic ordering: by area descending (top_k already sorted).
    # Empty top-K slots carry inf extents; zero them with `where` (a
    # multiply would propagate inf * 0 = nan).
    def _mask(x):
        m = valid.reshape((k,) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, 0.0)

    return {
        "boxes": _mask(boxes),
        "polygons": _mask(polygons),
        "scores": _mask(scores),
        "areas": top_areas,
        "valid": valid,
        "xmin": _mask(xmin), "xmax": _mask(xmax),
        "ymin": _mask(ymin), "ymax": _mask(ymax),
    }


def db_postprocess_batch(
    prob_maps: jnp.ndarray, bin_thresh: jnp.ndarray | float = 0.5, **kw
) -> Dict[str, jnp.ndarray]:
    """Batched [B, H, W] variant (kwargs as in :func:`db_postprocess`)."""
    fn = partial(db_postprocess, **kw)
    return jax.vmap(lambda p: fn(p, bin_thresh))(prob_maps)


def extract_detections(
    post: Dict[str, np.ndarray],
    orig_width: int,
    orig_height: int,
    map_size: int = 640,
    min_box_px: int = 10,
) -> List[Dict[str, Any]]:
    """Host-side: fixed-size arrays for ONE frame -> detection dicts.

    Output format matches reference ``TextDetector.detect``
    (``text_detector.py:171-176``): bbox ints in original-frame space
    (truncating scale, as the reference does), polygon ints in map
    (640) space, and the >10px min-size filter applied in original
    coordinates (``text_detector.py:166``).
    """
    boxes = np.asarray(post["boxes"])
    polys = np.asarray(post["polygons"])
    scores = np.asarray(post["scores"])
    valid = np.asarray(post["valid"])

    out: List[Dict[str, Any]] = []
    sx = orig_width / map_size
    sy = orig_height / map_size
    for i in range(boxes.shape[0]):
        if not valid[i]:
            continue
        x1 = int(boxes[i, 0] * sx)
        y1 = int(boxes[i, 1] * sy)
        x2 = int(boxes[i, 2] * sx)
        y2 = int(boxes[i, 3] * sy)
        if x2 - x1 <= min_box_px or y2 - y1 <= min_box_px:
            continue
        out.append(
            {
                "bbox": [x1, y1, x2, y2],
                "confidence": float(scores[i]),
                "polygon": np.round(polys[i]).astype(int).tolist(),
            }
        )
    return out
