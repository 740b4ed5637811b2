"""Transformer recognizer runtime (TrOCR-class).

Parity surface with the reference ``TransformerRecognizer``
(reference ``app/ml/models/text_recognizer.py:39-69``): BGR crops in,
``{'text', 'confidence'}`` out. The engine batches crops and runs one
KV-cached greedy decode for the whole batch (the reference decodes one
crop at a time with ``generate(max_length=50)``).

Weights: the environment has no network egress, so there is no HF hub
download. The model runs standalone with the char-level tokenizer
(random weights until trained or imported); ``model_path`` may point to
a pickled flax variables file, an orbax dir, or a torch ``.pth``
(imported via models/import_torch.py).
"""
from __future__ import annotations

import logging
import pickle
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..models.trocr import (
    CharTokenizer,
    TrOCR,
    TrOCRConfig,
    greedy_generate,
    small_config,
)

logger = logging.getLogger(__name__)


class TransformerRecognizer:
    def __init__(
        self,
        model_path: Optional[str] = None,
        config: Optional[TrOCRConfig] = None,
        tokenizer=None,
        pad_batch: int = 16,
        seed: int = 0,
    ):
        self.tokenizer = tokenizer or CharTokenizer()
        if config is None and model_path:
            config = self._sidecar_config(model_path)
        self.cfg = config or TrOCRConfig(vocab_size=self.tokenizer.vocab_size)
        self.model = TrOCR(self.cfg)
        self.pad_batch = pad_batch
        if model_path:
            self.variables = self._load(model_path)
        else:
            dummy_img = jnp.zeros(
                (1, self.cfg.image_size, self.cfg.width, 3), jnp.float32
            )
            dummy_tok = jnp.zeros((1, 2), jnp.int32)
            self.variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), dummy_img, dummy_tok
            )

    @staticmethod
    def _sidecar_config(model_path: str) -> Optional[TrOCRConfig]:
        """Checkpoints carry their architecture in a sidecar
        ``<ckpt>_config.json`` / ``<ckpt>/config.json`` (written by
        train.trocr_trainer) so serving needs no out-of-band config."""
        p = Path(model_path)
        for cand in (p.parent / f"{p.name}_config.json", p / "config.json"):
            if cand.exists():
                from ..train.trocr_trainer import load_config

                return load_config(str(cand))
        return None

    def _load(self, model_path: str):
        p = Path(model_path)
        if p.suffix in (".pth", ".pt"):
            from ..models.import_torch import import_trocr_pth

            variables = import_trocr_pth(model_path, self.cfg)
        elif p.is_dir():
            from ..train.checkpoint import restore_variables

            variables = restore_variables(model_path)
        else:
            with open(model_path, "rb") as f:
                variables = pickle.load(f)
        # device_put once at load: restored trees are host numpy and
        # would otherwise re-upload per jitted call.
        return jax.device_put(variables)

    # ------------------------------------------------------------------
    def _prepare(self, images: List[np.ndarray]) -> np.ndarray:
        """BGR uint8 crops -> normalized [N, H, W, 3] f32 (mean/std 0.5,
        the TrOCR processor's normalization)."""
        h, w = self.cfg.image_size, self.cfg.width
        out = np.zeros((len(images), h, w, 3), np.float32)
        for i, img in enumerate(images):
            if img.ndim == 2:
                img = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            out[i] = cv2.resize(rgb, (w, h)).astype(np.float32) / 255.0
        return (out - 0.5) / 0.5

    def recognize(self, image: np.ndarray) -> Dict[str, Any]:
        return self.recognize_batch([image])[0]

    def recognize_batch(self, images: List[np.ndarray]) -> List[Dict[str, Any]]:
        if not images:
            return []
        try:
            batch = self._prepare(images)
            texts, confs = self.recognize_crops_device(jnp.asarray(batch))
            return [
                {"text": t, "confidence": float(c)} for t, c in zip(texts, confs)
            ]
        except Exception as e:
            logger.error("Text recognition failed: %s", e)
            return [{"text": "", "confidence": 0.0}] * len(images)

    def recognize_crops_device(
        self, crops: jnp.ndarray
    ) -> Tuple[List[str], np.ndarray]:
        """Normalized [N, S, S, 3] crops -> (texts, confidences [N])."""
        n = crops.shape[0]
        pad = -n % self.pad_batch if n else self.pad_batch
        if pad:
            crops = jnp.concatenate(
                [crops, jnp.zeros((pad,) + crops.shape[1:], crops.dtype)]
            )
        toks, confs = greedy_generate(
            self.model, self.variables, crops,
            bos_id=self.tokenizer.BOS, eos_id=self.tokenizer.EOS,
        )
        toks = np.asarray(toks)[:n]
        confs = np.asarray(confs)[:n]
        texts = [self.tokenizer.decode(row) for row in toks]
        return texts, confs
