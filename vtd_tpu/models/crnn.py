"""CRNN text recognizer (conv stack -> BiLSTM -> CTC vocab classifier).

TPU-native re-implementation of the reference CRNN (reference
``app/ml/models/text_recognizer.py:12-37``): a 7-conv VGG-style feature
extractor with asymmetric pooling for wide text strips, a 2-layer
bidirectional LSTM(256), and a linear classifier over the CTC vocab.

Input contract: NHWC float in [0, 1], shape [B, 32, 128, 3] (reference
resizes crops to 128x32 and scales /255, ``text_recognizer.py:116-120``).
The conv stack reduces 32x128 -> 1x31, giving T=31 timesteps of 512
features (matches the torch shapes: H 32/2/2/2/2=2 then a valid 2x2 conv
-> 1; W 128/2/2=32 then valid conv -> 31).

The LSTM uses torch's gate ordering (i, f, g, o) and separate
input/hidden biases so ``.pth`` checkpoints import weight-for-weight.
The recurrence is a ``lax.scan`` with one fused [B, 4H] gate matmul per
step — the idiomatic XLA formulation (no per-step Python).

Vocab parity: 95 printable chars at indices 1..95, blank=0, unk=96
(reference ``_build_vocab``, ``text_recognizer.py:86-91``).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

VOCAB_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    "!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~ "
)


def build_vocab() -> Dict[str, int]:
    vocab = {c: i + 1 for i, c in enumerate(VOCAB_CHARS)}
    vocab["<blank>"] = 0
    vocab["<unk>"] = len(vocab)
    return vocab


CRNN_VOCAB = build_vocab()
BLANK_ID = 0
UNK_ID = CRNN_VOCAB["<unk>"]
ID_TO_CHAR = {v: k for k, v in CRNN_VOCAB.items()}


def _bilstm_layer(
    x: jnp.ndarray,
    w_ih_f, w_hh_f, b_ih_f, b_hh_f,
    w_ih_r, w_hh_r, b_ih_r, b_hh_r,
) -> jnp.ndarray:
    """One bidirectional LSTM layer over [B, T, I] -> [B, T, 2H].

    Weights use torch layout: w_ih [4H, I], w_hh [4H, H], gate order
    (input, forget, cell, output). Both directions run in ONE lax.scan
    — the reverse stream is time-flipped and stacked on the batch axis,
    so each sequential step issues a single [2B, H] x [H, 4H] matmul
    instead of two half-sized ones (the scan's serial step count is the
    latency bound on TPU, so fewer, fatter steps win).
    """
    b, t, _ = x.shape
    hidden = w_hh_f.shape[1]
    x_t = jnp.swapaxes(x, 0, 1)  # [T, B, I]
    # Precompute input contributions for all timesteps in one matmul.
    xw_f = jnp.einsum(
        "tbi,gi->tbg", x_t, w_ih_f, preferred_element_type=jnp.float32
    ) + (b_ih_f + b_hh_f)
    xw_r = jnp.einsum(
        "tbi,gi->tbg", x_t[::-1], w_ih_r, preferred_element_type=jnp.float32
    ) + (b_ih_r + b_hh_r)
    xw = jnp.concatenate([xw_f, xw_r], axis=1)  # [T, 2B, 4H]
    w_hh = jnp.stack([w_hh_f, w_hh_r])  # [2, 4H, H]

    def step(carry, xg):
        h, c = carry  # [2B, H]
        h2 = h.reshape(2, b, hidden)
        hw = jnp.einsum(
            "dbh,dgh->dbg", h2, w_hh, preferred_element_type=jnp.float32
        ).reshape(2 * b, 4 * hidden)
        gates = xg + hw
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros((2 * b, hidden), jnp.float32),
        jnp.zeros((2 * b, hidden), jnp.float32),
    )
    _, hs = jax.lax.scan(step, init, xw)  # [T, 2B, H]
    fwd = jnp.swapaxes(hs[:, :b], 0, 1)  # [B, T, H]
    rev = jnp.swapaxes(hs[::-1, b:], 0, 1)
    return jnp.concatenate([fwd, rev], axis=-1)


class BiLSTM(nn.Module):
    """Multi-layer bidirectional LSTM with torch-compatible parameters."""

    hidden_size: int = 256
    num_layers: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = self.hidden_size
        y = x.astype(jnp.float32)
        for layer in range(self.num_layers):
            in_dim = y.shape[-1]
            weights = []
            for direction in ("", "_reverse"):
                suffix = f"l{layer}{direction}"
                weights += [
                    self.param(
                        f"weight_ih_{suffix}", nn.initializers.lecun_normal(),
                        (4 * h, in_dim), jnp.float32,
                    ),
                    self.param(
                        f"weight_hh_{suffix}", nn.initializers.orthogonal(),
                        (4 * h, h), jnp.float32,
                    ),
                    self.param(
                        f"bias_ih_{suffix}", nn.initializers.zeros, (4 * h,),
                        jnp.float32,
                    ),
                    self.param(
                        f"bias_hh_{suffix}", nn.initializers.zeros, (4 * h,),
                        jnp.float32,
                    ),
                ]
            y = _bilstm_layer(y, *weights)
        return y


class CRNN(nn.Module):
    """Conv feature extractor + BiLSTM + per-timestep classifier.

    Returns logits [B, T=31, vocab_size].
    """

    vocab_size: int = len(CRNN_VOCAB)
    hidden_size: int = 256
    num_layers: int = 2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name=name,
        )
        conv = lambda ch, k, pad, name: nn.Conv(
            ch, (k, k), padding=[(pad, pad), (pad, pad)], use_bias=True,
            dtype=self.dtype, name=name,
        )
        x = x.astype(self.dtype)
        x = nn.relu(norm("bn0")(conv(64, 3, 1, "conv0")(x)))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 16 x 64
        x = nn.relu(norm("bn1")(conv(128, 3, 1, "conv1")(x)))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # 8 x 32
        x = nn.relu(norm("bn2")(conv(256, 3, 1, "conv2")(x)))
        x = nn.relu(norm("bn3")(conv(256, 3, 1, "conv3")(x)))
        x = nn.max_pool(x, (2, 1), strides=(2, 1))  # 4 x 32
        x = nn.relu(norm("bn4")(conv(512, 3, 1, "conv4")(x)))
        x = nn.relu(norm("bn5")(conv(512, 3, 1, "conv5")(x)))
        x = nn.max_pool(x, (2, 1), strides=(2, 1))  # 2 x 32
        x = nn.relu(norm("bn6")(
            nn.Conv(512, (2, 2), padding="VALID", use_bias=True,
                    dtype=self.dtype, name="conv6")(x)
        ))  # [B, 1, 31, 512]

        b, h, w, c = x.shape
        seq = x.reshape(b, w, h * c).astype(jnp.float32)  # [B, T, 512]

        seq = BiLSTM(
            hidden_size=self.hidden_size, num_layers=self.num_layers,
            name="rnn",
        )(seq)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32, name="classifier")(seq)
        return logits
