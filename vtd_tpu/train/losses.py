"""DBNet training losses.

Semantics match the reference lightning module (reference
``app/ml/training/trainer.py:48-63,130-142``): total = BCE(probability)
+ BCE(threshold) + Dice(probability), with BCE taken on probabilities
(torch ``nn.BCELoss``) and Dice smoothed with 1e-5.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

EPS = 1e-7


def bce_loss(
    pred: jnp.ndarray, target: jnp.ndarray, sample_weight=None
) -> jnp.ndarray:
    """Binary cross-entropy on probabilities (nn.BCELoss parity).
    ``sample_weight``: optional [B] per-sample weights (0 excludes a
    padding sample from the mean)."""
    p = jnp.clip(pred.astype(jnp.float32), EPS, 1.0 - EPS)
    t = target.astype(jnp.float32)
    err = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    if sample_weight is None:
        return jnp.mean(err)
    w = sample_weight.astype(jnp.float32).reshape(
        (-1,) + (1,) * (err.ndim - 1)
    )
    denom = jnp.maximum(jnp.sum(w) * (err[0].size), 1.0)
    return jnp.sum(err * w) / denom


def dice_loss(
    pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1e-5,
    sample_weight=None,
) -> jnp.ndarray:
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32).reshape(
            (-1,) + (1,) * (p.ndim - 1)
        )
        p = p * w
        t = t * w
    inter = jnp.sum(p * t)
    dice = (2.0 * inter + smooth) / (jnp.sum(p) + jnp.sum(t) + smooth)
    return 1.0 - dice


def db_loss(
    outputs: Dict[str, jnp.ndarray], targets: Dict[str, jnp.ndarray],
    sample_weight=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """outputs/targets hold 'probability'/'threshold' ('*_map') arrays.
    ``sample_weight``: optional [B] weights — evaluation passes the
    batch validity mask so tail-padding samples don't skew the loss."""
    prob = outputs["probability"]
    thresh = outputs["threshold"]
    prob_t = targets["probability_map"]
    thresh_t = targets["threshold_map"]
    if prob.ndim == prob_t.ndim + 1:  # NHW1 vs NHW
        prob = prob[..., 0]
        thresh = thresh[..., 0]
    p_l = bce_loss(prob, prob_t, sample_weight)
    t_l = bce_loss(thresh, thresh_t, sample_weight)
    d_l = dice_loss(prob, prob_t, sample_weight=sample_weight)
    total = p_l + t_l + d_l
    return total, {
        "loss": total,
        "prob_loss": p_l,
        "thresh_loss": t_l,
        "dice_loss": d_l,
    }
