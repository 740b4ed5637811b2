"""Training CLI / recognizer-trainer tests."""
import numpy as np
import pytest


def test_recognizer_trainer_loss_decreases(tmp_path):
    from vtd_tpu.train.recognizer_trainer import (
        RecognizerTrainer,
        synthesize_text_lines,
    )

    images, texts = synthesize_text_lines(64, seed=1)
    trainer = RecognizerTrainer(
        {
            "checkpoint_dir": str(tmp_path),
            "max_epochs": 3,
            "batch_size": 16,
            "learning_rate": 1e-3,
        }
    )
    result = trainer.train(images, texts, images[:16], texts[:16])
    assert result["status"] == "success", result
    h = result["history"]
    assert h[-1]["train_loss"] < h[0]["train_loss"]
    assert "val_exact_match" in h[-1]
    assert result["best_model_path"]

    # checkpoint loads into the runtime recognizer
    from vtd_tpu.runtime.recognizer import TextRecognizer

    rec = TextRecognizer(
        model_path=result["best_model_path"], use_transformer=False,
        pad_batch=8,
    )
    out = rec.recognize_batch([np.full((40, 160, 3), 255, np.uint8)])
    assert isinstance(out[0]["text"], str)


def test_encode_labels():
    from vtd_tpu.models.crnn import CRNN_VOCAB
    from vtd_tpu.train.recognizer_trainer import encode_labels

    labels, pads = encode_labels(["ab", ""])
    assert labels[0, 0] == CRNN_VOCAB["a"]
    assert labels[0, 1] == CRNN_VOCAB["b"]
    assert labels[0, 2] == 0
    assert pads[0, 0] == 0.0 and pads[0, 2] == 1.0
    assert pads[1].all()


def test_train_detector_cli(tmp_path):
    from vtd_tpu.train.train_detector import main

    result = main(
        [
            "--synthetic", "--n-samples", "8", "--image-size", "64",
            "--epochs", "1", "--batch-size", "4",
            "--checkpoint-dir", str(tmp_path / "db"),
        ]
    )
    assert result["status"] == "success", result


def test_train_detector_cli_with_mesh(tmp_path):
    from vtd_tpu.train.train_detector import main

    result = main(
        [
            "--synthetic", "--n-samples", "8", "--image-size", "64",
            "--epochs", "1", "--batch-size", "8",
            "--checkpoint-dir", str(tmp_path / "db"),
            "--mesh", "4x2",
        ]
    )
    assert result["status"] == "success", result
