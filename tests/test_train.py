"""Trainer / losses / label-gen tests."""
import numpy as np
import pytest


def test_losses_match_reference_semantics():
    import jax.numpy as jnp
    from vtd_tpu.train.losses import bce_loss, db_loss, dice_loss

    pred = jnp.full((2, 8, 8), 0.8)
    tgt = jnp.ones((2, 8, 8))
    # BCE(0.8, 1) = -log(0.8)
    assert abs(float(bce_loss(pred, tgt)) - (-np.log(0.8))) < 1e-4
    # perfect dice -> 0 loss
    assert float(dice_loss(tgt, tgt)) < 1e-4
    total, aux = db_loss(
        {"probability": pred, "threshold": pred},
        {"probability_map": tgt, "threshold_map": tgt},
    )
    assert set(aux) == {"loss", "prob_loss", "thresh_loss", "dice_loss"}
    assert abs(
        float(total)
        - (float(aux["prob_loss"]) + float(aux["thresh_loss"]) + float(aux["dice_loss"]))
    ) < 1e-6


def test_label_generation_matches_host_annotation_processor():
    import jax.numpy as jnp
    from vtd_tpu.train.labels import make_maps
    from vtd_tpu.video import AnnotationProcessor

    boxes = np.array([[10, 10, 50, 30], [60, 40, 100, 60]], np.float32)
    valid = np.array([True, True])
    prob, thresh = make_maps(
        jnp.asarray(boxes), jnp.asarray(valid), 80, 120
    )
    ref_prob = AnnotationProcessor.create_probability_map(
        (80, 120), boxes.astype(int).tolist()
    )
    np.testing.assert_array_equal(np.asarray(prob), ref_prob)
    # threshold map is inside the probability map and smaller
    t = np.asarray(thresh)
    assert t.sum() > 0
    assert (t <= ref_prob).all()
    assert t.sum() < ref_prob.sum()


def test_label_generation_invalid_boxes():
    import jax.numpy as jnp
    from vtd_tpu.train.labels import make_maps

    boxes = np.array([[10, 10, 50, 30]], np.float32)
    prob, _ = make_maps(
        jnp.asarray(boxes), jnp.asarray(np.array([False])), 64, 64
    )
    assert float(np.asarray(prob).sum()) == 0.0


@pytest.fixture(scope="module")
def tiny_dataset():
    from vtd_tpu.train.labels import make_maps
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n, h, w = 8, 64, 64
    images = rng.random((n, h, w, 3), np.float32)
    probs, threshs = [], []
    for _ in range(n):
        boxes = np.array([[8, 8, 40, 24]], np.float32)
        p, t = make_maps(jnp.asarray(boxes), jnp.asarray([True]), h, w)
        probs.append(np.asarray(p))
        threshs.append(np.asarray(t))
    targets = {
        "probability_map": np.stack(probs),
        "threshold_map": np.stack(threshs),
    }
    return images, targets


def test_model_trainer_end_to_end(tmp_path, tiny_dataset):
    import jax.numpy as jnp
    from vtd_tpu.models.dbnet import DBNet
    from vtd_tpu.train import ModelTrainer, TextDetectionDataset

    images, targets = tiny_dataset
    ds = TextDetectionDataset(images, targets)
    trainer = ModelTrainer(
        {
            "checkpoint_dir": str(tmp_path / "ckpt"),
            "max_epochs": 2,
            "learning_rate": 1e-3,
            "weight_decay": 1e-5,
            "batch_size": 4,
        }
    )
    model = DBNet(dtype=jnp.float32)
    result = trainer.train(model, ds, ds)
    assert result["status"] == "success", result
    assert result["epochs_trained"] == 2
    assert result["best_model_path"]
    assert np.isfinite(result["best_val_loss"])
    # loss should decrease across epochs on this trivial task
    h = result["history"]
    assert h[-1]["train_loss"] <= h[0]["train_loss"] + 0.5
    for key in ("val_precision", "val_recall", "val_f1"):
        assert 0.0 <= h[-1][key] <= 1.0

    # checkpoint restores
    from vtd_tpu.train.checkpoint import restore_variables

    variables = restore_variables(result["best_model_path"])
    assert "params" in variables

    metrics = trainer.evaluate(model, ds, variables=variables)
    assert "val_loss" in metrics and np.isfinite(metrics["val_loss"])


def test_model_trainer_failure_path(tmp_path):
    import jax.numpy as jnp
    from vtd_tpu.models.dbnet import DBNet
    from vtd_tpu.train import ModelTrainer, TextDetectionDataset

    ds = TextDetectionDataset(
        np.zeros((2, 64, 64, 3), np.float32),
        {
            "probability_map": np.zeros((2, 64, 64), np.float32),
            "threshold_map": np.zeros((2, 64, 64), np.float32),
        },
    )
    bad = TextDetectionDataset(
        np.zeros((2, 61, 61, 3), np.float32),  # not divisible by 32
        {
            "probability_map": np.zeros((2, 61, 61), np.float32),
            "threshold_map": np.zeros((2, 61, 61), np.float32),
        },
    )
    trainer = ModelTrainer(
        {"checkpoint_dir": str(tmp_path), "max_epochs": 1, "batch_size": 2}
    )
    result = trainer.train(DBNet(dtype=jnp.float32), bad, bad)
    assert result["status"] == "failed"
    assert "error" in result
