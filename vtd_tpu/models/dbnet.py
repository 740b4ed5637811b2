"""DBNet: ResNet50-FPN + differentiable-binarization head.

TPU-native re-design of the reference detector (reference
``app/ml/models/text_detector.py:12-86``). The reference's FPN is
broken (it feeds the single C5 map to every lateral conv and would
crash; SURVEY.md §0) — this is the *correct* DBNet topology:

  backbone C2..C5 -> 1x1 laterals (256) -> top-down nearest-upsample adds
  -> per-level 3x3 smooth to 64ch -> upsample all to stride 4 -> concat
  (256) -> DBHead.

The head keeps the reference's intended contract: two branches
(probability + threshold), each Conv3x3 -> BN -> ReLU ->
ConvT(2,s2) -> BN -> ReLU -> ConvT(2,s2) -> sigmoid (reference
``text_detector.py:58-86``), so a 640x640 input yields full-resolution
640x640 maps in input coordinate space (honoring the ``_post_process``
contract at ``text_detector.py:161-170``).

Training-time DB approximate binary map B = sigmoid(k (P - T)), k=50
(standard DB formulation), is exposed for the trainer.
"""
from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ResNet50

Dtype = Any


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Nearest-neighbor upsample by an integer factor (NHWC).

    Uses reshape+broadcast (XLA fuses this well) rather than
    jax.image.resize's gather path.
    """
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class FPNNeck(nn.Module):
    """Correct FPN + DB-style concat neck. Output: stride-4, 256ch."""

    out_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False) -> jnp.ndarray:
        c2, c3, c4, c5 = feats
        lat = self.out_channels
        conv1 = lambda name: nn.Conv(lat, (1, 1), use_bias=False, dtype=self.dtype, name=name)

        p5 = conv1("lateral5")(c5)
        p4 = conv1("lateral4")(c4) + _upsample_nearest(p5, 2)
        p3 = conv1("lateral3")(c3) + _upsample_nearest(p4, 2)
        p2 = conv1("lateral2")(c2) + _upsample_nearest(p3, 2)

        sm = lat // 4  # 64ch per level, concat -> 256
        conv3 = lambda name: nn.Conv(
            sm, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name,
        )
        o5 = _upsample_nearest(conv3("smooth5")(p5), 8)
        o4 = _upsample_nearest(conv3("smooth4")(p4), 4)
        o3 = _upsample_nearest(conv3("smooth3")(p3), 2)
        o2 = conv3("smooth2")(p2)
        return jnp.concatenate([o2, o3, o4, o5], axis=-1)


def _depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, 4C] -> [B, 2H, 2W, C], channel layout (a*2+b)*C + c."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * 2, w * 2, c)


class _Upsample2x(nn.Module):
    """2x learned upsampling: 1x1 conv to 4C + depth-to-space.

    Mathematically identical to ConvTranspose(k=2, s=2) — each input
    pixel paints a 2x2 output block with per-phase kernels — but lowers
    to a plain MXU matmul instead of XLA's transposed-conv path (which
    tiles poorly at 640x640). Weight mapping from a transposed-conv
    kernel K[a, b, i, o]: conv kernel channel (a*2+b)*O + o (flax
    ConvTranspose kernels additionally need a spatial flip; torch
    ConvTranspose2d weights map directly — see models/import_torch.py).
    """

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        x = nn.Conv(
            4 * self.features, (1, 1), dtype=self.dtype, name="conv"
        )(x)
        return _depth_to_space2(x)


class _HeadBranch(nn.Module):
    """Conv3x3-BN-ReLU -> up2x-BN-ReLU -> up2x -> sigmoid.

    The two 2x upsamplings keep the reference DBHead's
    ConvTranspose(2, s2) parameter structure (text_detector.py:58-86)
    in MXU-friendly depth-to-space form.
    """

    in_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        mid = self.in_channels // 4
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name=name,
        )
        x = nn.Conv(
            mid, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv",
        )(x)
        x = nn.relu(norm("bn1")(x))
        x = _Upsample2x(mid, dtype=self.dtype, name="up1")(x)
        x = nn.relu(norm("bn2")(x))
        x = _Upsample2x(1, dtype=self.dtype, name="up2")(x)
        # f32 sigmoid math (bf16 saturates the logit tails), but emit
        # the map in compute dtype at inference: the [B, 640, 640] f32
        # output cost two 13 MB relayout copies per batch; probability
        # values in [0, 1] lose nothing that the 0.5-ish binarization
        # threshold or box-mean confidences can see at bf16.
        y = nn.sigmoid(x.astype(jnp.float32))
        return y if train else y.astype(self.dtype)


class DBHead(nn.Module):
    """Dual-branch DB head: probability map + threshold map."""

    in_channels: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        prob = _HeadBranch(self.in_channels, self.dtype, name="probability")(
            x, train=train
        )
        thresh = _HeadBranch(self.in_channels, self.dtype, name="threshold")(
            x, train=train
        )
        return {"probability": prob, "threshold": thresh}


class DBNet(nn.Module):
    """Full detector. Input NHWC float (normalized); output maps NHW1.

    ``__call__`` returns {'probability', 'threshold'} at input
    resolution; ``binary`` additionally returns the differentiable
    binarization map used by the DB training loss.
    """

    dtype: Dtype = jnp.bfloat16
    db_k: float = 50.0

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jnp.ndarray]:
        feats = ResNet50(dtype=self.dtype, name="backbone")(x, train=train)
        neck = FPNNeck(dtype=self.dtype, name="fpn")(feats, train=train)
        return DBHead(dtype=self.dtype, name="head")(neck, train=train)

    def binary(self, out: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        p, t = out["probability"], out["threshold"]
        return jax.nn.sigmoid(self.db_k * (p - t))
