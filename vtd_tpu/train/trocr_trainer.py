"""TrOCR-class transformer recognizer training.

The reference's transformer recognizer is pretrained HF TrOCR pulled
from the hub at runtime (reference ``text_recognizer.py:39-44``); a
zero-egress TPU pod cannot download it, and the reference ships no
recognizer trainer at all. This trainer makes the transformer path
self-sufficient: teacher-forced cross-entropy on synthetic text-line
crops (the same domain-matched geometry the CRNN trainer uses), AdamW,
greedy-decode exact-match eval, checkpoint + sidecar config.json so the
serving path can reconstruct the exact model.
"""
from __future__ import annotations

import dataclasses
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.trocr import CharTokenizer, TrOCR, TrOCRConfig, greedy_generate
from .checkpoint import save_variables
from .recognizer_trainer import synthesize_text_lines

logger = logging.getLogger(__name__)


def demo_config(
    image_size: int = 48, image_width: int = 192, **kw
) -> TrOCRConfig:
    """A compact TrOCR that trains to useful accuracy in minutes on one
    chip (≈4M params) — the standalone-checkpoint counterpart of the
    reference's hub download.

    Default input is TEXT-SHAPED (48x192, ~24 px/char on an 8-char
    line), not the HF square: squashing lines into 64x64 left ~8
    px/char and capped heldout random-8 exact match at 21/32 with
    dropped/confused characters."""
    tok = CharTokenizer()
    base = dict(
        image_size=image_size, image_width=image_width, patch_size=8,
        enc_dim=128, enc_layers=4, enc_heads=4, enc_mlp=256,
        dec_dim=128, dec_layers=4, dec_heads=4, dec_mlp=256,
        vocab_size=tok.vocab_size, max_len=16, dtype=jnp.float32,
    )
    base.update(kw)
    return TrOCRConfig(**base)


def save_config(path: str, cfg: TrOCRConfig) -> None:
    d = dataclasses.asdict(cfg)
    d["dtype"] = jnp.dtype(cfg.dtype).name
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        json.dump(d, f, indent=1)


def load_config(path: str) -> TrOCRConfig:
    with open(path) as f:
        d = json.load(f)
    d["dtype"] = jnp.dtype(d.get("dtype", "float32"))
    return TrOCRConfig(**d)


def synthesize_trocr_crops(
    n: int, cfg: TrOCRConfig, seed: int = 0,
    length_range: Tuple[int, int] = (3, 9),
) -> Tuple[np.ndarray, List[str]]:
    """[n, S, S, 3] normalized crops (mean/std 0.5, matching the
    inference ``_prepare``) + their strings."""
    images, texts = synthesize_text_lines(
        n, seed=seed, height=cfg.image_size, width=cfg.width,
        length_range=length_range,
    )
    return (images - 0.5) / 0.5, texts


def encode_tokens(
    texts: List[str], tok: CharTokenizer, max_len: int
) -> np.ndarray:
    """Strings -> [B, max_len+1] (<bos> text <eos> <pad>...), one longer
    than max_len so inputs/targets both span max_len steps.

    Texts longer than max_len-1 chars are truncated to keep <eos> in
    the row: a plain tail-truncation dropped <eos> for full-length
    strings, training the model that long strings never terminate (at
    inference it then appended garbage after correct long transcripts
    until the decode cap).
    """
    out = np.zeros((len(texts), max_len + 1), np.int32)  # 0 == <pad>
    for i, t in enumerate(texts):
        ids = tok.encode(t[: max_len - 1])  # [bos] + chars + [eos]
        out[i, : len(ids)] = ids
    return out


def make_trocr_train_step(model: TrOCR, tx, augment: bool = False):
    """``augment=True`` adds on-device photometric jitter (per-sample
    contrast/brightness plus gaussian noise, in the normalized [-1, 1]
    space) — free on TPU and the main defense against memorizing a
    fixed synthetic set (a 4M-param model drives CE on 16k samples to
    ~0.003 while held-out exact match stalls)."""

    @jax.jit
    def step(params, opt_state, images, tokens, key):
        if images.dtype == jnp.uint8:
            # Crops ship uint8 and normalize on device: 4x fewer
            # host->device bytes. This matters beyond bandwidth — this
            # image's TPU relay client retains every transfer buffer
            # host-side (measured ~28 MB leaked per 28 MB batch, see
            # docs/ARCHITECTURE.md "relay transfer leak"), so a long
            # float32 run OOMs the 125 GB host (round-4 45-epoch run
            # died at 130 GB RSS). The ±1/255 quantization is far below
            # the 0.06-sigma augmentation noise.
            images = images.astype(jnp.float32) / 127.5 - 1.0
        if augment:
            kc, kb, kn = jax.random.split(key, 3)
            b = images.shape[0]
            contrast = jax.random.uniform(
                kc, (b, 1, 1, 1), minval=0.75, maxval=1.25
            )
            brightness = jax.random.uniform(
                kb, (b, 1, 1, 1), minval=-0.25, maxval=0.25
            )
            noise = 0.06 * jax.random.normal(kn, images.shape)
            images = images * contrast + brightness + noise
        inputs, targets = tokens[:, :-1], tokens[:, 1:]
        mask = (targets != CharTokenizer.PAD).astype(jnp.float32)

        def loss_fn(p):
            logits = model.apply({"params": p}, images, inputs)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits, targets
            )
            return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


class TrOCRTrainer:
    """config keys: checkpoint_dir, max_epochs, learning_rate,
    weight_decay, batch_size, warmup_steps, seed."""

    def __init__(self, config: Dict[str, Any], model_config: Optional[TrOCRConfig] = None):
        self.config = dict(config)
        self.model_config = model_config or demo_config()
        self.tokenizer = CharTokenizer()

    def train(
        self,
        images: np.ndarray,
        texts: List[str],
        val_images: Optional[np.ndarray] = None,
        val_texts: Optional[List[str]] = None,
        data_fn: Optional[Any] = None,
    ) -> Dict[str, Any]:
        """``data_fn(epoch) -> (images, texts)``: when given, every
        epoch trains on a FRESH sample draw (generated on a background
        thread while the device trains the current epoch). A fixed
        32k-sample set saturates heldout exact match after ~10 epochs —
        the model memorizes strings that photometric augmentation alone
        cannot re-randomize; fresh draws make the epoch count behave
        like dataset size."""
        cfg = self.config
        mc = self.model_config
        try:
            model = TrOCR(mc)
            batch_size = int(cfg.get("batch_size", 32))
            variables = jax.jit(model.init)(
                jax.random.PRNGKey(int(cfg.get("seed", 0))),
                jnp.zeros((1, mc.image_size, mc.width, 3), jnp.float32),
                jnp.zeros((1, 2), jnp.int32),
            )
            params = variables["params"]
            init_from = cfg.get("init_from")
            if init_from:
                # Continuation training: start from a previous
                # checkpoint's weights (fresh optimizer/schedule — use a
                # lower peak LR than the original run).
                from .checkpoint import restore_variables

                params = restore_variables(str(init_from))["params"]
            lr = float(cfg.get("learning_rate", 3e-4))
            warmup = int(cfg.get("warmup_steps", 100))
            sched = optax.warmup_cosine_decay_schedule(
                0.0, lr, warmup,
                max(warmup + 1,
                    int(cfg.get("max_epochs", 10))
                    * (len(images) // batch_size)),
            )
            tx = optax.adamw(
                sched, weight_decay=float(cfg.get("weight_decay", 1e-4))
            )
            opt_state = tx.init(params)
            augment = bool(cfg.get("augment", True))
            step = make_trocr_train_step(model, tx, augment=augment)
            aug_key = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 7)

            def pack_u8(imgs: np.ndarray) -> np.ndarray:
                """Normalized [-1,1] float crops -> uint8 for transfer
                (the train step unnormalizes on device)."""
                if imgs.dtype == np.uint8:
                    return imgs
                return np.clip(
                    (imgs + 1.0) * 127.5 + 0.5, 0.0, 255.0
                ).astype(np.uint8)

            tokens = encode_tokens(texts, self.tokenizer, mc.max_len)
            images = pack_u8(images)
            n = len(images)
            save_every = int(cfg.get("save_every", 10))
            ckpt_dir = Path(cfg.get("checkpoint_dir", "./checkpoints"))
            ckpt_dir.mkdir(parents=True, exist_ok=True)
            path = str(ckpt_dir / "trocr_final")
            history = []
            pool = prefetch = None
            if data_fn is not None:
                from concurrent.futures import ThreadPoolExecutor

                pool = ThreadPoolExecutor(1)
            for epoch in range(int(cfg.get("max_epochs", 10))):
                t0 = time.time()
                if pool is not None:
                    if prefetch is not None:
                        images, texts = prefetch.result()
                        images = pack_u8(images)
                        tokens = encode_tokens(
                            texts, self.tokenizer, mc.max_len
                        )
                        n = len(images)
                    # next epoch's draw renders (host, cv2) while this
                    # epoch's steps run on the device; no draw for the
                    # epoch past the last — it would never be consumed
                    # and a 32k-sample render can't be cancelled once
                    # running, delaying exit and racing the final save
                    if epoch + 1 < int(cfg.get("max_epochs", 10)):
                        prefetch = pool.submit(data_fn, epoch + 1)
                    else:
                        prefetch = None
                perm = np.random.default_rng(epoch).permutation(n)
                losses = []
                for i in range(0, n - batch_size + 1, batch_size):
                    sel = perm[i:i + batch_size]
                    aug_key, k = jax.random.split(aug_key)
                    params, opt_state, loss = step(
                        params, opt_state,
                        jnp.asarray(images[sel]), jnp.asarray(tokens[sel]),
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
                        self.evaluate(model, params, val_images, val_texts)
                    )
                history.append(rec)
                logger.info("epoch %d: %s", epoch, rec)
                if save_every and (epoch + 1) % save_every == 0:
                    # Crash/preemption safety: a 45-epoch round-4 run
                    # was OOM-killed at the finish line and lost all
                    # its training because the only save was at the end.
                    # Alternate between two autosave paths — the
                    # checkpointer deletes the target before writing, so
                    # a kill landing mid-save must not be able to
                    # destroy the only surviving checkpoint.
                    slot = ((epoch + 1) // save_every) % 2
                    auto = str(ckpt_dir / f"trocr_autosave_{'ab'[slot]}")
                    save_variables(auto, {"params": params})
                    save_config(
                        str(ckpt_dir / "trocr_final_config.json"), mc
                    )
                    (ckpt_dir / "autosave_latest.txt").write_text(
                        f"{auto}\nepoch={epoch}\n"
                    )

            if pool is not None:
                pool.shutdown(wait=False, cancel_futures=True)
            save_variables(path, {"params": params})
            save_config(str(ckpt_dir / "trocr_final_config.json"), mc)
            return {
                "status": "success",
                "best_model_path": path,
                "final_loss": history[-1]["train_loss"],
                "epochs_trained": len(history),
                "history": history,
            }
        except Exception as e:
            logger.error("TrOCR training failed: %s", e)
            return {"status": "failed", "error": str(e)}

    def evaluate(
        self, model, params, images, texts, batch: int = 64
    ) -> Dict[str, float]:
        tok = self.tokenizer
        decoded: List[str] = []
        for i in range(0, len(images), batch):
            chunk = np.asarray(images[i:i + batch])
            if len(chunk) < batch:  # static shapes: pad the tail
                chunk = np.concatenate(
                    [chunk, np.zeros((batch - len(chunk),) + chunk.shape[1:],
                                     chunk.dtype)]
                )
            toks, _ = greedy_generate(
                model, {"params": params}, jnp.asarray(chunk),
                bos_id=tok.BOS, eos_id=tok.EOS,
            )
            decoded.extend(tok.decode(r) for r in np.asarray(toks))
        decoded = decoded[: len(texts)]
        exact = sum(d == t for d, t in zip(decoded, texts)) / max(len(texts), 1)
        char_correct = sum(
            sum(a == b for a, b in zip(d, t)) for d, t in zip(decoded, texts)
        )
        char_total = sum(max(len(t), 1) for t in texts)
        return {
            "val_exact_match": exact,
            "val_char_accuracy": char_correct / max(char_total, 1),
        }
