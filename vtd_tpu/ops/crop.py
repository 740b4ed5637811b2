"""On-device text-region cropping for the recognizer.

The reference crops each detection from the original frame with numpy
slicing and resizes to 128x32 on the CPU, one crop at a time
(reference ``app/ml/inference/pipeliine.py:117-125``,
``text_recognizer.py:116-118``). Here all K crops of a frame are
extracted in one batched bilinear gather on device — either axis-aligned
(``crop_and_resize_boxes``, exact parity with the reference's
crop+resize) or perspective-rectified from the rotated polygon
(``rectify_polygons``, higher quality for slanted text).

Static shapes: [K, out_h, out_w, 3] regardless of detection count;
invalid slots produce zero crops.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_sample(image: jnp.ndarray, xq: jnp.ndarray, yq: jnp.ndarray):
    """Sample image [H, W, C] at float coords (xq, yq) [..., ] -> [..., C].

    Clamp-to-edge boundary handling (matches cv2.resize on crops whose
    sources are in-bounds; out-of-bounds queries clamp).
    """
    h, w = image.shape[:2]
    # Clamp the QUERY coords first (like the _mm variant): computing the
    # fractional weights from unclamped coords makes an out-of-bounds
    # query interpolate toward the wrong interior pixel (xq=-0.01 would
    # weight pixel 1 by 0.99) instead of replicating the edge.
    xq = jnp.clip(xq, 0.0, w - 1.0)
    yq = jnp.clip(yq, 0.0, h - 1.0)
    x0 = jnp.floor(xq)
    y0 = jnp.floor(yq)
    fx = (xq - x0)[..., None]
    fy = (yq - y0)[..., None]
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)

    img = image.astype(jnp.float32)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_and_resize_boxes(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """Axis-aligned crop+resize of K boxes from one image.

    image: [H, W, 3] (uint8 or float); boxes: [K, 4] (x1, y1, x2, y2) in
    image coordinates; valid: [K] bool. Returns [K, out_h, out_w, 3]
    float32 in [0, 1].

    Equivalent to ``cv2.resize(frame[y1:y2, x1:x2], (out_w, out_h))``
    per box, but batched on device.
    """
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    # cv2.resize bilinear grid: src = (dst + 0.5) * scale - 0.5
    gx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w  # [out_w]
    gy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h  # [out_h]
    xq = x1[:, None, None] + gy[None, :, None] * 0.0 + gx[None, None, :] * bw[:, None, None] - 0.5
    yq = y1[:, None, None] + gy[None, :, None] * bh[:, None, None] + gx[None, None, :] * 0.0 - 0.5

    crops = _bilinear_sample(image, xq, yq) / 255.0
    return jnp.where(valid[:, None, None, None], crops, 0.0)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def crop_and_resize_boxes_mm(
    image: jnp.ndarray,
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """Matmul formulation of :func:`crop_and_resize_boxes`.

    Bilinear crop+resize is separable: build per-box triangle-kernel
    interpolation matrices A_y [K, out_h, H] and A_x [K, out_w, W]
    (weight = relu(1 - |src_row - query|)) and contract them against the
    image with two einsums. On TPU this runs on the MXU instead of the
    serialized gather path — an order of magnitude faster for K x 32 x
    128 crop batches.
    """
    h, w = image.shape[:2]
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)

    gy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h  # [out_h]
    gx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    yq = jnp.clip(y1[:, None] + gy[None, :] * bh[:, None] - 0.5, 0, h - 1)
    xq = jnp.clip(x1[:, None] + gx[None, :] * bw[:, None] - 0.5, 0, w - 1)

    rows = jnp.arange(h, dtype=jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)
    a_y = jnp.maximum(0.0, 1.0 - jnp.abs(rows[None, None, :] - yq[:, :, None]))
    a_x = jnp.maximum(0.0, 1.0 - jnp.abs(cols[None, None, :] - xq[:, :, None]))

    img = image.astype(jnp.float32)
    tmp = jnp.einsum(
        "kyh,hwc->kywc", a_y, img, preferred_element_type=jnp.float32
    )
    crops = jnp.einsum(
        "kxw,kywc->kyxc", a_x, tmp, preferred_element_type=jnp.float32
    ) / 255.0
    return jnp.where(valid[:, None, None, None], crops, 0.0)


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def rectify_polygons(
    image: jnp.ndarray,
    polygons: jnp.ndarray,
    valid: jnp.ndarray,
    out_h: int = 32,
    out_w: int = 128,
) -> jnp.ndarray:
    """Rotated-rect rectification: sample each polygon onto a straight
    out_h x out_w strip.

    polygons: [K, 4, 2] rect corners ordered (u-min/v-min, u-max/v-min,
    u-max/v-max, u-min/v-max) as produced by db_postprocess. The long
    edge maps to the output width.
    """
    p0, p1, p3 = polygons[:, 0], polygons[:, 1], polygons[:, 3]
    eu = p1 - p0  # corner0 -> corner1
    ev = p3 - p0  # corner0 -> corner3
    # Put the longer edge along the output width.
    lu = jnp.linalg.norm(eu, axis=-1)
    lv = jnp.linalg.norm(ev, axis=-1)
    swap = (lv > lu)[:, None]
    e_w = jnp.where(swap, ev, eu)
    e_h = jnp.where(swap, eu, ev)

    gx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / out_w
    gy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / out_h
    # query = p0 + gx * e_w + gy * e_h
    xq = (
        p0[:, 0][:, None, None]
        + gy[None, :, None] * e_h[:, 0][:, None, None]
        + gx[None, None, :] * e_w[:, 0][:, None, None]
    )
    yq = (
        p0[:, 1][:, None, None]
        + gy[None, :, None] * e_h[:, 1][:, None, None]
        + gx[None, None, :] * e_w[:, 1][:, None, None]
    )
    crops = _bilinear_sample(image, xq, yq) / 255.0
    return jnp.where(valid[:, None, None, None], crops, 0.0)
