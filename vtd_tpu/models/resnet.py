"""ResNet-50 backbone (flax linen, NHWC, bf16-friendly).

TPU-first re-implementation of the torchvision ``resnet50`` the
reference uses as the DBNet backbone (reference
``app/ml/models/text_detector.py:16-20``). Unlike the reference — which
wraps torchvision and only exposes the final 2048-channel stride-32 map
— this backbone returns the C2..C5 pyramid taps (strides 4/8/16/32,
channels 256/512/1024/2048) that a *correct* FPN needs (the reference's
FPN is broken; see SURVEY.md §0).

Layout is NHWC (TPU-native); compute dtype is configurable (bfloat16 by
default for MXU throughput) while parameters stay float32.
BatchNorm uses running statistics in inference mode, with
``use_running_average`` toggled for training — state layout is
compatible with a torch ``.pth`` importer (see models/import_torch.py).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    features: int  # bottleneck width; output channels = 4 * features
    strides: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)
        # f32 norm math during training (stability); at inference BN is
        # a per-channel scale+shift and running it in the compute dtype
        # keeps ALL activations bf16 — f32 BN forced a bf16->f32->bf16
        # bounce around every block (2x HBM traffic on the elementwise
        # chain; measured 8.7 -> ~6 ms backbone on v5e).
        norm = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype,
        )
        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=[(1, 1), (1, 1)], name="conv2",
        )(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape[-1] != self.features * 4 or self.strides != 1:
            residual = conv(
                self.features * 4, (1, 1),
                strides=(self.strides, self.strides), name="downsample_conv",
            )(residual)
            residual = norm(name="downsample_bn")(residual)

        return nn.relu(y + residual.astype(y.dtype))


class _S2DStem(nn.Module):
    """7x7/stride-2 stem conv computed as a 4x4/stride-1 conv on the
    2x2 space-to-depth rearrangement of the input.

    Numerically identical to ``nn.Conv(64, (7,7), strides=2,
    padding=(3,3))`` (exact weight transform, parity-tested), but the
    MXU sees 12 input channels instead of 3 and no strided window —
    the classic TPU stem trick. The parameter keeps the canonical
    (7,7,C,64) kernel at the same ``conv1/kernel`` checkpoint path, so
    importers and existing checkpoints are untouched; the rearranged
    kernel is derived inside the forward (constant-folded per step).
    """

    features: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c, self.features),
        )
        b, h, w, _ = x.shape
        if h % 2 or w % 2:  # odd inputs: plain strided conv
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        xs = (
            x.reshape(b, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(b, h // 2, w // 2, 4 * c)
        )
        # out[i] reads input rows 2i-3..2i+3 = s2d cells i-2..i+1 with
        # in-cell offset da: p = 2(ca-2)+da+3, i.e. Wp[2ca+da] for W
        # left-padded by one (p = -1 never contributes).
        kp = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kk = (
            kp.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        return jax.lax.conv_general_dilated(
            xs.astype(self.dtype), kk.astype(self.dtype),
            window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class ResNet50(nn.Module):
    """Returns (C2, C3, C4, C5) feature maps at strides 4/8/16/32."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        x = x.astype(self.dtype)
        x = _S2DStem(64, dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        taps = []
        widths = (64, 128, 256, 512)
        for stage, (n_blocks, width) in enumerate(zip(self.stage_sizes, widths)):
            for block in range(n_blocks):
                strides = 2 if (stage > 0 and block == 0) else 1
                x = Bottleneck(
                    width, strides=strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
            taps.append(x)

        return tuple(taps)  # C2, C3, C4, C5
