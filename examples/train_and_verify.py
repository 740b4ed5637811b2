"""End-to-end capability demo: train on synthetic data, verify OCR.

Trains the DBNet detector and the CRNN recognizer from scratch on
procedurally generated data (no external datasets — the environment has
no network egress), then runs the full video pipeline on a fresh clip
with burned-in text and reports detection IoU and transcript accuracy.

Run:  python examples/train_and_verify.py [--quick]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vtd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2
import jax.numpy as jnp


def make_detection_dataset(n: int, size: int, seed: int):
    """Frames with randomly placed words + DB label maps."""
    from vtd_tpu.train.labels import make_maps

    rng = np.random.default_rng(seed)
    words = [
        "HELLO", "WORLD", "VIDEO", "TEXT", "DETECT", "TPU", "JAX",
        "FRAME", "OCR", "FAST", "123", "2026",
    ]
    images = np.zeros((n, size, size, 3), np.float32)
    probs, threshs = [], []
    all_boxes = []
    for i in range(n):
        shade = int(rng.integers(160, 255))
        img = np.full((size, size, 3), shade, np.uint8)
        # light structure
        cv2.circle(
            img,
            (int(rng.integers(0, size)), int(rng.integers(0, size))),
            int(rng.integers(20, 80)),
            (shade - 30, shade - 20, shade - 10), -1,
        )
        boxes = []
        for _ in range(int(rng.integers(1, 4))):
            word = words[int(rng.integers(len(words)))]
            scale = float(rng.uniform(0.9, 2.0))
            thick = 2 if scale < 1.4 else 3
            (tw, th), base = cv2.getTextSize(
                word, cv2.FONT_HERSHEY_SIMPLEX, scale, thick
            )
            if tw >= size - 20:
                continue
            x = int(rng.integers(5, size - tw - 5))
            y = int(rng.integers(th + 5, size - 5))
            cv2.putText(
                img, word, (x, y), cv2.FONT_HERSHEY_SIMPLEX, scale,
                (0, 0, 0), thick,
            )
            boxes.append([x, y - th, x + tw, y + base])
        images[i] = img.astype(np.float32) / 255.0
        arr = np.zeros((8, 4), np.float32)
        valid = np.zeros(8, bool)
        for j, bx in enumerate(boxes[:8]):
            arr[j] = bx
            valid[j] = True
        p, t = make_maps(jnp.asarray(arr), jnp.asarray(valid), size, size)
        probs.append(np.asarray(p))
        threshs.append(np.asarray(t))
        all_boxes.append(boxes)
    return images, {
        "probability_map": np.stack(probs),
        "threshold_map": np.stack(threshs),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--out", default="./demo_models")
    parser.add_argument(
        "--detector-ckpt", default="",
        help="reuse an existing detector checkpoint (skip detector training)",
    )
    parser.add_argument(
        "--trocr-ckpt", default="",
        help="also run the e2e verification with the transformer "
             "recognizer loaded from this checkpoint (train.trocr_trainer "
             "output, e.g. demo_models2/trocr/trocr_final)",
    )
    args = parser.parse_args()

    from vtd_tpu.models.dbnet import DBNet
    from vtd_tpu.train import ModelTrainer, TextDetectionDataset
    from vtd_tpu.train.recognizer_trainer import (
        RecognizerTrainer,
        synthesize_text_lines,
    )

    os.makedirs(args.out, exist_ok=True)
    report = {}

    # ------------------------------------------------------------------
    print("=== training CRNN recognizer (CTC) ===", flush=True)
    n_lines = 512 if args.quick else 4096
    epochs = 6 if args.quick else 25
    imgs, texts = synthesize_text_lines(n_lines, seed=0)
    vimgs, vtexts = synthesize_text_lines(256, seed=99)
    t0 = time.time()
    rec_result = RecognizerTrainer(
        {
            "checkpoint_dir": os.path.join(args.out, "crnn"),
            "max_epochs": epochs,
            "batch_size": 128,
            "learning_rate": 1e-3,
        }
    ).train(imgs, texts, vimgs, vtexts)
    assert rec_result["status"] == "success", rec_result
    report["crnn"] = {
        "train_seconds": round(time.time() - t0, 1),
        "final_loss": rec_result["final_loss"],
        **{
            k: rec_result["history"][-1][k]
            for k in ("val_exact_match", "val_char_accuracy")
        },
    }
    print(json.dumps(report["crnn"]), flush=True)

    # ------------------------------------------------------------------
    det_size = 320
    if args.detector_ckpt:
        print("=== reusing detector checkpoint ===", flush=True)
        detector_ckpt = args.detector_ckpt
        report["dbnet"] = {"reused": detector_ckpt}
    else:
        print("=== training DBNet detector ===", flush=True)
        n_det = 64 if args.quick else 384
        det_epochs = 4 if args.quick else 20
        images, targets = make_detection_dataset(n_det, det_size, seed=1)
        split = n_det * 7 // 8
        t0 = time.time()
        det_result = ModelTrainer(
            {
                "checkpoint_dir": os.path.join(args.out, "dbnet"),
                "max_epochs": det_epochs,
                "batch_size": 8,
                "learning_rate": 3e-4,
                "early_stop_patience": 10,
            }
        ).train(
            DBNet(dtype=jnp.float32),
            TextDetectionDataset(
                images[:split], {k: v[:split] for k, v in targets.items()}
            ),
            TextDetectionDataset(
                images[split:], {k: v[split:] for k, v in targets.items()}
            ),
        )
        assert det_result["status"] == "success", det_result
        detector_ckpt = det_result["best_model_path"]
        report["dbnet"] = {
            "train_seconds": round(time.time() - t0, 1),
            "best_val_loss": det_result["best_val_loss"],
            "val_f1": det_result["history"][-1]["val_f1"],
            "ckpt": detector_ckpt,
        }
    print(json.dumps(report["dbnet"]), flush=True)

    # ------------------------------------------------------------------
    print("=== end-to-end verification on a fresh clip ===", flush=True)
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "verify.mp4")
        w = cv2.VideoWriter(
            clip, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (640, 640)
        )
        truth = ["HELLO", "WORLD", "123"]
        for i in range(60):
            frame = np.full((640, 640, 3), 230, np.uint8)
            for k, word in enumerate(truth):
                cv2.putText(
                    frame, word, (80, 160 + 160 * k),
                    cv2.FONT_HERSHEY_SIMPLEX, 2.0, (0, 0, 0), 3,
                )
            w.write(frame)
        w.release()

        pipeline = VideoTextPipeline(
            detector_path=detector_ckpt,
            recognizer_path=rec_result["best_model_path"],
            use_transformer_ocr=False,
            confidence_threshold=0.5,
            batch_size=8,
            detector_input_size=det_size,
        )
        result = asyncio.run(pipeline.process_video(clip, td))

    assert result["status"] == "success", result
    s = result["summary"]
    detected = set(s["detected_texts"])
    exact = sum(1 for t in truth if t in detected)
    report["e2e"] = {
        "frames": s["total_frames"],
        "detections": s["total_detections"],
        "detected_texts": sorted(detected)[:10],
        "truth": truth,
        "exact_matches": exact,
        "avg_det_conf": round(s["avg_detection_confidence"], 3),
    }
    print(json.dumps(report["e2e"], indent=1), flush=True)

    # ------------------------------------------------------------------
    if args.trocr_ckpt:
        print("=== e2e verification, transformer recognizer ===", flush=True)
        with tempfile.TemporaryDirectory() as td:
            clip = os.path.join(td, "verify_t.mp4")
            w = cv2.VideoWriter(
                clip, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (640, 640)
            )
            truth = ["HELLO", "WORLD", "123"]
            for i in range(60):
                frame = np.full((640, 640, 3), 230, np.uint8)
                for k, word in enumerate(truth):
                    cv2.putText(
                        frame, word, (80, 160 + 160 * k),
                        cv2.FONT_HERSHEY_SIMPLEX, 2.0, (0, 0, 0), 3,
                    )
                w.write(frame)
            w.release()

            pipeline = VideoTextPipeline(
                detector_path=detector_ckpt,
                recognizer_path=args.trocr_ckpt,
                use_transformer_ocr=True,
                confidence_threshold=0.5,
                batch_size=8,
                detector_input_size=det_size,
            )
            result = asyncio.run(pipeline.process_video(clip, td))
        assert result["status"] == "success", result
        s = result["summary"]
        detected = set(s["detected_texts"])
        exact = sum(1 for t in truth if t in detected)
        report["e2e_transformer"] = {
            "frames": s["total_frames"],
            "detections": s["total_detections"],
            "detected_texts": sorted(detected)[:10],
            "truth": truth,
            "exact_matches": exact,
        }
        print(json.dumps(report["e2e_transformer"], indent=1), flush=True)

    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("REPORT WRITTEN", flush=True)


if __name__ == "__main__":
    main()
