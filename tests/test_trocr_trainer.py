"""TrOCR trainer: loss goes down, checkpoint + sidecar config round-trip
through the serving-side TransformerRecognizer."""
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_cfg():
    from vtd_tpu.models.trocr import small_config, CharTokenizer

    return small_config(
        image_size=32, patch_size=8, vocab_size=CharTokenizer().vocab_size,
        max_len=16,
    )


def test_trocr_train_and_reload(tmp_path, tiny_cfg):
    from vtd_tpu.train.trocr_trainer import (
        TrOCRTrainer,
        synthesize_trocr_crops,
    )

    images, texts = synthesize_trocr_crops(64, tiny_cfg, seed=0)
    trainer = TrOCRTrainer(
        {
            "checkpoint_dir": str(tmp_path), "max_epochs": 2,
            "batch_size": 16, "learning_rate": 1e-3, "warmup_steps": 2,
        },
        model_config=tiny_cfg,
    )
    out = trainer.train(images, texts)
    assert out["status"] == "success", out
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]

    # Reload through the serving runtime: sidecar config reconstructs
    # the architecture without any explicit config argument.
    from vtd_tpu.runtime.trocr_runtime import TransformerRecognizer

    rec = TransformerRecognizer(model_path=out["best_model_path"], pad_batch=4)
    assert rec.cfg.image_size == tiny_cfg.image_size
    assert rec.cfg.enc_dim == tiny_cfg.enc_dim
    crop = (np.random.default_rng(0).random((20, 60, 3)) * 255).astype(
        np.uint8
    )
    r = rec.recognize(crop)
    assert set(r) == {"text", "confidence"}


def test_encode_tokens_layout():
    from vtd_tpu.models.trocr import CharTokenizer
    from vtd_tpu.train.trocr_trainer import encode_tokens

    tok = CharTokenizer()
    arr = encode_tokens(["AB"], tok, max_len=6)
    assert arr.shape == (1, 7)
    assert arr[0, 0] == tok.BOS
    assert arr[0, 3] == tok.EOS
    assert (arr[0, 4:] == tok.PAD).all()
