"""On-device DBNet training-label generation.

Batched pure-JAX equivalent of the host ``AnnotationProcessor``
(reference ``app/ml/utils/preprocessing.py:168-208``): a binary
probability map filled inside each bbox, and a threshold map filled
inside each bbox shrunk toward its centroid by ``shrink_ratio`` (0.4).
Boxes arrive as a fixed-size [K, 4] array with a validity mask, so the
whole label batch is one fused elementwise program (no per-box Python).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("height", "width"))
def make_maps(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    height: int,
    width: int,
    shrink_ratio: float = 0.4,
):
    """boxes [K,4] (x1,y1,x2,y2), valid [K] -> (prob_map, thresh_map) [H,W].

    A pixel is inside a box if x1 <= x < x2 and y1 <= y < y2 (slice
    semantics of the reference's ``prob_map[y1:y2, x1:x2] = 1``).
    """
    ys = jax.lax.broadcasted_iota(jnp.float32, (height, width), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (height, width), 1)

    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))

    def inside(x1, y1, x2, y2):
        # [K, H, W] via broadcasting
        in_x = (xs[None] >= x1[:, None, None]) & (xs[None] < x2[:, None, None])
        in_y = (ys[None] >= y1[:, None, None]) & (ys[None] < y2[:, None, None])
        return in_x & in_y & valid[:, None, None]

    prob = jnp.any(inside(x1, y1, x2, y2), axis=0).astype(jnp.float32)

    cx = (x1 + x2) / 2.0
    cy = (y1 + y2) / 2.0
    k = 1.0 - shrink_ratio
    sx1 = cx + (x1 - cx) * k
    sx2 = cx + (x2 - cx) * k
    sy1 = cy + (y1 - cy) * k
    sy2 = cy + (y2 - cy) * k
    thresh = jnp.any(inside(sx1, sy1, sx2, sy2), axis=0).astype(jnp.float32)
    return prob, thresh


make_maps_batch = jax.jit(
    jax.vmap(make_maps, in_axes=(0, 0, None, None)),
    static_argnums=(2, 3),
)
