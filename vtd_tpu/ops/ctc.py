"""CTC greedy decoding.

Device side: one fused pass computing per-timestep argmax ids, max
probabilities, and the CTC emit mask (drop blanks and repeats) for a
whole batch — replacing the reference's per-sample Python loop over
timesteps (reference ``app/ml/models/text_recognizer.py:142-166``).

Host side: string assembly from the (ids, mask, conf) arrays.

Confidence semantics: mean of the per-emitted-timestep max softmax
probability. (The reference indexes the probability tensor by output
*text position* instead of timestep — ``text_recognizer.py:161`` — a
bug per SURVEY.md §0; this implements the intended timestep indexing.)
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.crnn import BLANK_ID, ID_TO_CHAR, UNK_ID


@jax.jit
def ctc_greedy_decode_arrays(
    logits: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """logits [B, T, V] -> {'ids': [B,T] i32, 'emit': [B,T] bool,
    'probs': [B,T] f32 (max softmax prob per step), 'confidence': [B]}.

    emit marks timesteps that produce an output character: not blank,
    not a duplicate of the previous timestep's id, and not <unk>
    (the reference skips <unk> in decoding, text_recognizer.py:157-160).
    """
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    ids = jnp.argmax(probs, axis=-1).astype(jnp.int32)  # [B, T]
    pmax = jnp.max(probs, axis=-1)  # [B, T]

    prev = jnp.pad(ids[:, :-1], ((0, 0), (1, 0)), constant_values=-1)
    emit = (ids != BLANK_ID) & (ids != prev) & (ids != UNK_ID)

    n = jnp.sum(emit, axis=1)
    conf = jnp.sum(pmax * emit, axis=1) / jnp.maximum(n, 1)
    conf = jnp.where(n > 0, conf, 0.0)
    return {"ids": ids, "emit": emit, "probs": pmax, "confidence": conf}


def emit_mask_np(ids: np.ndarray) -> np.ndarray:
    """Host-side CTC collapse rule on an [.., T] id array — the numpy
    twin of the jitted emit computation above (the fused pipeline ships
    only ids, so the host re-derives emit; keep the rule HERE so the
    two paths cannot drift)."""
    prev = np.concatenate(
        [np.full(ids.shape[:-1] + (1,), -1, ids.dtype), ids[..., :-1]],
        axis=-1,
    )
    return (ids != BLANK_ID) & (ids != prev) & (ids != UNK_ID)


def ids_to_text(
    ids: np.ndarray, emit: np.ndarray
) -> List[str]:
    """Host: [B, T] id/emit arrays -> list of decoded strings."""
    out: List[str] = []
    for b in range(ids.shape[0]):
        chars = [
            ID_TO_CHAR.get(int(i), "")
            for i in ids[b][emit[b].astype(bool)]
        ]
        out.append("".join(c for c in chars if len(c) == 1))
    return out


def decode_batch(logits: jnp.ndarray) -> List[Tuple[str, float]]:
    """Convenience: logits -> [(text, confidence)] for a batch."""
    arrs = ctc_greedy_decode_arrays(logits)
    ids = np.asarray(arrs["ids"])
    emit = np.asarray(arrs["emit"])
    confs = np.asarray(arrs["confidence"])
    texts = ids_to_text(ids, emit)
    return [(t, float(c)) for t, c in zip(texts, confs)]
