"""DBNet trainer (optax + jit, mesh-aware).

Capability parity with the reference Lightning stack (reference
``app/ml/training/trainer.py``):

  * loss = BCE(prob) + BCE(thresh) + Dice(prob)        (:48-63)
  * AdamW (lr 1e-4, wd 1e-5 defaults)                   (:108-112)
  * ReduceLROnPlateau on val_loss, factor 0.5 patience 5 (:114-121)
  * val precision/recall/F1 at 0.5 binarization          (:83-105)
  * checkpoint top-3 by val_loss, early stop patience 10 (:150-166)
  * ``ModelTrainer.train/evaluate`` status dicts          (:181-218)

TPU-native differences: the step is a single jitted function with
donated state; metrics (TP/FP/FN for P/R/F1) are computed on device and
reduced with the loss, never materializing the flattened prediction
tensors on the host (the reference round-trips every probability map
through sklearn). Multi-chip: pass a ``Mesh`` — batches shard over the
data axis, wide kernels over the model axis (parallel/sharding.py), and
XLA inserts the gradient psums.
"""
from __future__ import annotations

import logging
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.dbnet import DBNet
from ..parallel.sharding import batch_sharding, infer_param_shardings
from .checkpoint import save_variables
from .losses import db_loss

logger = logging.getLogger(__name__)


class TextDetectionDataset:
    """In-memory dataset of (image, target) pairs (trainer.py:14-30).

    images: [N, H, W, 3] float32 (normalized); targets: dict with
    'probability_map' and 'threshold_map', each [N, H, W].
    """

    def __init__(self, images, targets, transform=None):
        self.images = np.asarray(images, np.float32)
        self.targets = {
            k: np.asarray(v, np.float32) for k, v in targets.items()
        }
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def batches(
        self, batch_size: int, shuffle: bool = False, seed: int = 0,
        with_valid: bool = False,
    ) -> Iterable[Tuple]:
        """``with_valid=True`` additionally yields a [batch_size] bool
        mask marking the real (non-wrap-padding) samples — evaluation
        needs it or the tail batch double-counts up to batch_size-1
        samples in loss/P/R/F1."""
        n = len(self)
        idx = np.arange(n)
        if shuffle:
            np.random.default_rng(seed).shuffle(idx)
        # fixed batch shapes: drop nothing — pad the tail by wrapping
        for i in range(0, n, batch_size):
            sel = idx[i:i + batch_size]
            n_real = len(sel)
            if n_real < batch_size:
                # Tile (not a single wrap) so datasets smaller than the
                # deficit still fill the fixed batch shape.
                reps = -(-(batch_size - n_real) // n)  # ceil
                sel = np.concatenate([sel] + [idx] * reps)[:batch_size]
            imgs = self.images[sel]
            if self.transform:
                imgs = self.transform(imgs)
            targets = {k: v[sel] for k, v in self.targets.items()}
            if with_valid:
                valid = np.zeros(batch_size, bool)
                valid[:n_real] = True
                yield imgs, targets, valid
            else:
                yield imgs, targets


def create_train_state(
    model: DBNet,
    rng: jax.Array,
    input_shape: Tuple[int, ...],
    learning_rate: float = 1e-4,
    weight_decay: float = 1e-5,
) -> Dict[str, Any]:
    """Init params + AdamW with an injectable (plateau-scalable) LR."""
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, jnp.zeros(input_shape, jnp.float32), train=False
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, weight_decay=weight_decay
    )
    return {
        "params": params,
        "batch_stats": batch_stats,
        "opt_state": tx.init(params),
        "tx": tx,
        "model": model,
    }


def make_train_step(model: DBNet, tx):
    # Donate the trainable state: params + BN stats + AdamW moments are
    # ~3x the parameter bytes, and without donation XLA holds input AND
    # output copies across every step (2x peak HBM for state). Callers
    # always rebind the returned pytrees.
    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, images, targets):
        def loss_fn(p):
            out, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            total, aux = db_loss(
                {k: v[..., 0] for k, v in out.items()}, targets
            )
            return total, (aux, mutated["batch_stats"])

        (loss, (aux, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, aux

    return train_step


def make_eval_step(model: DBNet):
    @jax.jit
    def eval_step(params, batch_stats, images, targets, valid):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=False,
        )
        total, aux = db_loss(
            {k: v[..., 0] for k, v in out.items()}, targets,
            sample_weight=valid,
        )
        # on-device confusion counts at 0.5 binarization (trainer.py:92-98),
        # masked so tail-padding samples don't double-count
        w = valid.astype(jnp.float32)[:, None, None]
        pred = (out["probability"][..., 0] > 0.5).astype(jnp.float32)
        tgt = targets["probability_map"]
        tp = jnp.sum(pred * tgt * w)
        fp = jnp.sum(pred * (1 - tgt) * w)
        fn = jnp.sum((1 - pred) * tgt * w)
        aux.update({"tp": tp, "fp": fp, "fn": fn})
        return aux

    return eval_step


class ModelTrainer:
    """Training driver (parity surface: trainer.py:144-218).

    config keys: checkpoint_dir, max_epochs, learning_rate, weight_decay,
    batch_size, early_stop_patience (10), plateau_patience (5),
    plateau_factor (0.5), save_top_k (3).
    """

    def __init__(self, config: Dict[str, Any], mesh: Optional[Mesh] = None):
        self.config = dict(config)
        self.mesh = mesh

    # ------------------------------------------------------------------
    def train(
        self,
        model: DBNet,
        train_data: TextDetectionDataset,
        val_data: TextDetectionDataset,
    ) -> Dict[str, Any]:
        cfg = self.config
        try:
            batch_size = int(cfg.get("batch_size", 8))
            h, w = train_data.images.shape[1:3]
            state = create_train_state(
                model,
                jax.random.PRNGKey(int(cfg.get("seed", 0))),
                (batch_size, h, w, 3),
                learning_rate=float(cfg.get("learning_rate", 1e-4)),
                weight_decay=float(cfg.get("weight_decay", 1e-5)),
            )
            params = state["params"]
            batch_stats = state["batch_stats"]
            opt_state = state["opt_state"]
            tx = state["tx"]

            if self.mesh is not None:
                pshard = infer_param_shardings(params, self.mesh)
                params = jax.tree_util.tree_map(
                    jax.device_put, params, pshard
                )
                repl = NamedSharding(self.mesh, P())
                batch_stats = jax.device_put(batch_stats, repl)

            train_step = make_train_step(model, tx)
            eval_step = make_eval_step(model)

            def put_batch(imgs, targets):
                if self.mesh is None:
                    return jnp.asarray(imgs), {
                        k: jnp.asarray(v) for k, v in targets.items()
                    }
                bs = batch_sharding(self.mesh, imgs.ndim)
                bs3 = batch_sharding(self.mesh, 3)
                return (
                    jax.device_put(imgs, bs),
                    {k: jax.device_put(v, bs3) for k, v in targets.items()},
                )

            ckpt_dir = Path(cfg.get("checkpoint_dir", "./checkpoints"))
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            max_epochs = int(cfg.get("max_epochs", 10))
            es_patience = int(cfg.get("early_stop_patience", 10))
            pl_patience = int(cfg.get("plateau_patience", 5))
            pl_factor = float(cfg.get("plateau_factor", 0.5))
            top_k = int(cfg.get("save_top_k", 3))

            best_val = float("inf")
            best_path = ""
            epochs_no_improve = 0
            plateau_count = 0
            saved: List[Tuple[float, str]] = []
            history: List[Dict[str, float]] = []
            epoch = 0

            for epoch in range(max_epochs):
                t0 = time.time()
                train_losses = []
                for imgs, targets in train_data.batches(
                    batch_size, shuffle=True, seed=epoch
                ):
                    imgs_d, tgt_d = put_batch(imgs, targets)
                    params, batch_stats, opt_state, aux = train_step(
                        params, batch_stats, opt_state, imgs_d, tgt_d
                    )
                    train_losses.append(float(aux["loss"]))

                val = self._evaluate_epoch(
                    eval_step, params, batch_stats, val_data, batch_size,
                    put_batch,
                )
                history.append(
                    {
                        "epoch": epoch,
                        "train_loss": float(np.mean(train_losses)),
                        "epoch_seconds": time.time() - t0,
                        **val,
                    }
                )
                logger.info("epoch %d: %s", epoch, history[-1])

                # plateau LR schedule (trainer.py:114-121)
                if val["val_loss"] < best_val - 1e-6:
                    plateau_count = 0
                else:
                    plateau_count += 1
                    if plateau_count > pl_patience:
                        opt_state.hyperparams["learning_rate"] = (
                            opt_state.hyperparams["learning_rate"] * pl_factor
                        )
                        plateau_count = 0

                # checkpoint top-k by val_loss (trainer.py:151-158)
                if len(saved) < top_k or val["val_loss"] < saved[-1][0]:
                    path = str(
                        ckpt_dir / f"epoch{epoch}-val{val['val_loss']:.4f}"
                    )
                    save_variables(
                        path,
                        {"params": params, "batch_stats": batch_stats},
                    )
                    saved.append((val["val_loss"], path))
                    saved.sort(key=lambda t: t[0])
                    for _, stale in saved[top_k:]:
                        import shutil

                        shutil.rmtree(stale, ignore_errors=True)
                    saved = saved[:top_k]

                # early stopping (trainer.py:160-165)
                if val["val_loss"] < best_val - 1e-6:
                    best_val = val["val_loss"]
                    best_path = saved[0][1]
                    epochs_no_improve = 0
                else:
                    epochs_no_improve += 1
                    if epochs_no_improve >= es_patience:
                        break

            return {
                "status": "success",
                "best_model_path": best_path or (saved[0][1] if saved else ""),
                "best_val_loss": float(best_val),
                "epochs_trained": epoch + 1,
                "history": history,
            }
        except Exception as e:
            logger.error("Training failed: %s", e)
            return {"status": "failed", "error": str(e)}

    # ------------------------------------------------------------------
    def _evaluate_epoch(
        self, eval_step, params, batch_stats, data, batch_size, put_batch
    ) -> Dict[str, float]:
        losses, tp, fp, fn = [], 0.0, 0.0, 0.0
        for imgs, targets, valid in data.batches(
            batch_size, with_valid=True
        ):
            imgs_d, tgt_d = put_batch(imgs, targets)
            aux = jax.device_get(
                eval_step(params, batch_stats, imgs_d, tgt_d,
                          jnp.asarray(valid))
            )
            # weight the running loss mean by real-sample count so the
            # tail batch contributes proportionally
            losses.extend([float(aux["loss"])] * int(valid.sum()))
            tp += float(aux["tp"])
            fp += float(aux["fp"])
            fn += float(aux["fn"])
        precision = tp / (tp + fp) if tp + fp > 0 else 0.0
        recall = tp / (tp + fn) if tp + fn > 0 else 0.0
        f1 = (
            2 * precision * recall / (precision + recall)
            if precision + recall > 0
            else 0.0
        )
        return {
            "val_loss": float(np.mean(losses)) if losses else 0.0,
            "val_precision": precision,
            "val_recall": recall,
            "val_f1": f1,
        }

    # ------------------------------------------------------------------
    def evaluate(
        self, model: DBNet, test_data: TextDetectionDataset,
        variables: Optional[Any] = None,
    ) -> Dict[str, float]:
        """Parity with trainer.py:213-218 (returns metric dict)."""
        batch_size = int(self.config.get("batch_size", 8))
        if variables is None:
            h, w = test_data.images.shape[1:3]
            state = create_train_state(
                model, jax.random.PRNGKey(0), (batch_size, h, w, 3)
            )
            params, batch_stats = state["params"], state["batch_stats"]
        else:
            params = variables["params"]
            batch_stats = variables.get("batch_stats", FrozenDict())
        eval_step = make_eval_step(model)

        def put_batch(imgs, targets):
            return jnp.asarray(imgs), {
                k: jnp.asarray(v) for k, v in targets.items()
            }

        return self._evaluate_epoch(
            eval_step, params, batch_stats, test_data, batch_size, put_batch
        )
