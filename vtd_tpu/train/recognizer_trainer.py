"""CRNN recognizer training (CTC loss).

The reference ships no recognizer trainer (its README references a
``train_recognizer`` module that does not exist — SURVEY.md §3.5); this
fills the gap: optax ``ctc_loss`` over the CRNN's per-timestep logits,
AdamW, greedy-decode exact-match/char-accuracy eval, and a synthetic
text-line generator (cv2-rendered strings) so the recognizer can be
trained standalone with zero external data.
"""
from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from ..models.crnn import BLANK_ID, CRNN, CRNN_VOCAB, ID_TO_CHAR
from ..ops.ctc import ctc_greedy_decode_arrays, ids_to_text
from .checkpoint import save_variables

logger = logging.getLogger(__name__)

MAX_LABEL_LEN = 15  # CRNN emits T=31 steps; CTC needs len <= (T+1)/2 repeats


def encode_labels(
    texts: List[str], max_len: int = MAX_LABEL_LEN
) -> Tuple[np.ndarray, np.ndarray]:
    """Strings -> (labels [B, L] int32 padded with blank, paddings [B, L])."""
    labels = np.zeros((len(texts), max_len), np.int32)
    padding = np.ones((len(texts), max_len), np.float32)
    for i, t in enumerate(texts):
        ids = [CRNN_VOCAB.get(c, CRNN_VOCAB["<unk>"]) for c in t[:max_len]]
        labels[i, : len(ids)] = ids
        padding[i, : len(ids)] = 0.0
    return labels, padding


def synthesize_text_lines(
    n: int, seed: int = 0, height: int = 32, width: int = 128,
    length_range: Tuple[int, int] = (3, 9),
) -> Tuple[np.ndarray, List[str]]:
    """Render random strings into [n, 32, 128, 3] float crops.

    The geometry mirrors what the inference pipeline feeds the
    recognizer: text rendered at a random scale, cropped to its tight
    bounding box with a few pixels of jittered padding, then resized
    (aspect-distorting) to the recognizer input — NOT a fixed layout.
    Training on fixed-layout lines leaves a domain gap that garbles
    real detected crops.
    """
    import cv2

    rng = np.random.default_rng(seed)
    chars = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
    images = np.zeros((n, height, width, 3), np.float32)
    texts = []
    for i in range(n):
        length = int(rng.integers(*length_range))
        text = "".join(rng.choice(list(chars)) for _ in range(length))
        scale = float(rng.uniform(0.8, 2.2))
        thick = int(rng.integers(1, 3)) if scale < 1.5 else int(rng.integers(2, 4))
        (tw, th), base = cv2.getTextSize(
            text, cv2.FONT_HERSHEY_SIMPLEX, scale, thick
        )
        margin = 20
        canvas = np.full(
            (th + base + 2 * margin, tw + 2 * margin, 3),
            int(rng.integers(180, 255)), np.uint8,
        )
        cv2.putText(
            canvas, text, (margin, margin + th),
            cv2.FONT_HERSHEY_SIMPLEX, scale, (0, 0, 0), thick,
        )
        # tight box + jittered padding, like a detected region crop
        px0 = margin - int(rng.integers(0, 6))
        py0 = margin - int(rng.integers(0, 6))
        px1 = margin + tw + int(rng.integers(0, 6))
        py1 = margin + th + base + int(rng.integers(0, 6))
        crop = canvas[max(py0, 0):py1, max(px0, 0):px1]
        images[i] = (
            cv2.resize(crop, (width, height), interpolation=cv2.INTER_LINEAR)
            .astype(np.float32) / 255.0
        )
        texts.append(text)
    return images, texts


def make_crnn_train_step(model: CRNN, tx, augment: bool = False):
    """``augment=True``: on-device photometric jitter (per-sample
    contrast/brightness + gaussian noise on the [0,1] crops) — free on
    TPU and the defense against memorizing a fixed synthetic set (same
    treatment as the TrOCR trainer)."""

    @jax.jit
    def step(params, batch_stats, opt_state, images, labels, label_pad,
             key):
        if augment:
            kc, kb, kn = jax.random.split(key, 3)
            b = images.shape[0]
            contrast = jax.random.uniform(
                kc, (b, 1, 1, 1), minval=0.8, maxval=1.2
            )
            brightness = jax.random.uniform(
                kb, (b, 1, 1, 1), minval=-0.12, maxval=0.12
            )
            noise = 0.03 * jax.random.normal(kn, images.shape)
            images = jnp.clip(
                images * contrast + brightness + noise, 0.0, 1.0
            )

        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            b, t, _ = logits.shape
            logit_pad = jnp.zeros((b, t), jnp.float32)
            loss = jnp.mean(
                optax.ctc_loss(
                    logits, logit_pad, labels, label_pad, blank_id=BLANK_ID
                )
            )
            return loss, mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, loss

    return step


class RecognizerTrainer:
    """config keys: checkpoint_dir, max_epochs, learning_rate,
    weight_decay, batch_size."""

    def __init__(self, config: Dict[str, Any]):
        self.config = dict(config)

    def train(
        self,
        images: np.ndarray,
        texts: List[str],
        val_images: Optional[np.ndarray] = None,
        val_texts: Optional[List[str]] = None,
    ) -> Dict[str, Any]:
        cfg = self.config
        try:
            model = CRNN(dtype=jnp.float32)
            batch_size = int(cfg.get("batch_size", 32))
            variables = jax.jit(model.init, static_argnames=("train",))(
                jax.random.PRNGKey(int(cfg.get("seed", 0))),
                jnp.zeros((1, 32, 128, 3), jnp.float32),
                train=False,
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", FrozenDict())
            tx = optax.adamw(
                float(cfg.get("learning_rate", 1e-3)),
                weight_decay=float(cfg.get("weight_decay", 1e-5)),
            )
            opt_state = tx.init(params)
            augment = bool(cfg.get("augment", True))
            step = make_crnn_train_step(model, tx, augment=augment)
            aug_key = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 11)

            labels, pads = encode_labels(texts)
            n = len(images)
            max_epochs = int(cfg.get("max_epochs", 10))
            history = []
            for epoch in range(max_epochs):
                t0 = time.time()
                perm = np.random.default_rng(epoch).permutation(n)
                losses = []
                for i in range(0, n - batch_size + 1, batch_size):
                    sel = perm[i:i + batch_size]
                    aug_key, k = jax.random.split(aug_key)
                    params, batch_stats, opt_state, loss = step(
                        params, batch_stats, opt_state,
                        jnp.asarray(images[sel]),
                        jnp.asarray(labels[sel]),
                        jnp.asarray(pads[sel]),
                        k,
                    )
                    losses.append(float(loss))
                rec = {
                    "epoch": epoch,
                    "train_loss": float(np.mean(losses)),
                    "epoch_seconds": time.time() - t0,
                }
                if val_images is not None:
                    rec.update(
                        self.evaluate(
                            model, params, batch_stats, val_images, val_texts
                        )
                    )
                history.append(rec)
                logger.info("epoch %d: %s", epoch, rec)

            ckpt_dir = Path(cfg.get("checkpoint_dir", "./checkpoints"))
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            path = str(ckpt_dir / "crnn_final")
            save_variables(
                path, {"params": params, "batch_stats": batch_stats}
            )
            return {
                "status": "success",
                "best_model_path": path,
                "final_loss": history[-1]["train_loss"],
                "epochs_trained": max_epochs,
                "history": history,
            }
        except Exception as e:
            logger.error("Recognizer training failed: %s", e)
            return {"status": "failed", "error": str(e)}

    def evaluate(
        self, model, params, batch_stats, images, texts
    ) -> Dict[str, float]:
        # jit the apply ONCE per trainer: a fresh lambda each call can
        # never hit the jit cache, recompiling the eval forward every
        # epoch (minutes per compile on a 1-core host).
        if not hasattr(self, "_eval_apply"):
            self._eval_apply = jax.jit(lambda v, x: model.apply(v, x))
        logits = self._eval_apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(images),
        )
        arrs = jax.device_get(ctc_greedy_decode_arrays(logits))
        decoded = ids_to_text(arrs["ids"], arrs["emit"])
        exact = sum(d == t for d, t in zip(decoded, texts)) / max(len(texts), 1)
        char_correct = 0
        char_total = 0
        for d, t in zip(decoded, texts):
            char_total += max(len(t), 1)
            char_correct += sum(a == b for a, b in zip(d, t))
        return {
            "val_exact_match": exact,
            "val_char_accuracy": char_correct / max(char_total, 1),
        }
