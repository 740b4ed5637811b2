"""Fused on-device frame preprocessing.

Replaces the reference's per-frame host-side chain — BGR->RGB cvtColor,
torchvision ``Resize((640, 640))`` + ``ToTensor`` + ImageNet
``Normalize`` (reference ``app/ml/models/text_detector.py:99-124``) and
``ImageProcessor`` helpers (``app/ml/utils/preprocessing.py:100-166``) —
with one jitted NHWC transform: uint8 batch in, normalized compute-dtype
batch out. XLA fuses the resize, scale and normalize into a single HBM
pass; frames cross host->device exactly once per batch as uint8 (3x less
PCIe/DMA traffic than float32).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

# torchvision Normalize constants (reference text_detector.py:103).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@partial(jax.jit, static_argnames=("out_size", "dtype", "bgr_to_rgb", "antialias"))
def preprocess_frames(
    frames: jnp.ndarray,
    out_size: int = 640,
    dtype: jnp.dtype = jnp.bfloat16,
    bgr_to_rgb: bool = True,
    antialias: bool = True,
) -> jnp.ndarray:
    """uint8 [B, H, W, 3] (BGR) -> normalized [B, S, S, 3] in `dtype`.

    Plain (non-aspect-preserving) bilinear resize to ``out_size``, /255,
    ImageNet normalize — the exact transform the reference detector
    applies per frame on the CPU.
    """
    x = frames.astype(jnp.float32) / 255.0
    if bgr_to_rgb:
        x = x[..., ::-1]
    b = x.shape[0]
    x = jax.image.resize(
        x, (b, out_size, out_size, 3), method="bilinear", antialias=antialias
    )
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    x = (x - mean) / std
    return x.astype(dtype)


@partial(jax.jit, static_argnames=("out_size",))
def resize_with_padding(
    image: jnp.ndarray, out_size: int = 640
) -> jnp.ndarray:
    """Aspect-preserving resize + center pad (ImageProcessor parity,
    reference ``preprocessing.py:102-116``). Single image [H, W, 3] u8.

    Note: pad offsets are computed from static shapes, so this is
    trace-specialized per input resolution (fine: resolutions per video
    are constant).
    """
    h, w = image.shape[:2]
    scale = min(out_size / w, out_size / h)
    nw, nh = int(w * scale), int(h * scale)
    resized = jax.image.resize(
        image.astype(jnp.float32), (nh, nw, 3), method="bilinear"
    )
    top = (out_size - nh) // 2
    left = (out_size - nw) // 2
    out = jnp.zeros((out_size, out_size, 3), jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (top, left, 0))
    return out.astype(image.dtype)


@jax.jit
def yuv420_to_bgr(packed: jnp.ndarray) -> jnp.ndarray:
    """I420-packed [B, H*3/2, W] uint8 -> BGR [B, H, W, 3] uint8.

    Shipping YUV420 instead of BGR halves host->device bytes; the
    inverse conversion (BT.601 full-range, matching OpenCV's
    COLOR_BGR2YUV_I420) is a few fused elementwise ops on device.
    """
    b, h15, w = packed.shape
    h = (h15 * 2) // 3
    y = packed[:, :h, :].astype(jnp.float32)
    u = packed[:, h:h + h // 4, :].reshape(b, h // 2, w // 2)
    v = packed[:, h + h // 4:, :].reshape(b, h // 2, w // 2)

    def up2(x):
        x = x[:, :, None, :, None]
        x = jnp.broadcast_to(x, (b, h // 2, 2, w // 2, 2))
        return x.reshape(b, h, w).astype(jnp.float32)

    # video-range BT.601, matching cv2's COLOR_YUV2BGR_I420
    u = up2(u) - 128.0
    v = up2(v) - 128.0
    yc = 1.164 * (y - 16.0)
    r = yc + 1.596 * v
    g = yc - 0.391 * u - 0.813 * v
    bl = yc + 2.018 * u
    bgr = jnp.stack([bl, g, r], axis=-1)
    return jnp.clip(jnp.round(bgr), 0, 255).astype(jnp.uint8)


@jax.jit
def normalize_frame(frame: jnp.ndarray) -> jnp.ndarray:
    """u8 -> f32 in [0,1] (ImageProcessor.normalize_image parity)."""
    return frame.astype(jnp.float32) / 255.0


@jax.jit
def denormalize_frame(frame: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(frame * 255.0, 0, 255).astype(jnp.uint8)
