"""Diagnose summary text tracks on the verify clip.

Runs the demo-checkpoint pipeline on the procedural HELLO/WORLD/123
clip (same generator as examples/verify_checkpoints.py) and prints
EVERY merged track — text, frame count, detection/recognition
confidences, bbox — so summary-gate thresholds (the confirmed-track
filter in ``runtime/pipeline._dedup_summary``) are set from measured
junk-vs-real separations instead of guesses.

Run:  python tools/diag_tracks.py [--transformer] [--cpu]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

parser = argparse.ArgumentParser()
parser.add_argument("--transformer", action="store_true")
parser.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (safe while the TPU is busy)")
parser.add_argument("--detector", default="demo_models2/dbnet/best_bf16")
parser.add_argument("--crnn", default="demo_models2/crnn/crnn_final")
parser.add_argument("--trocr", default="models/text_recognizer_trocr")
args = parser.parse_args()

if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/vtd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2
import numpy as np

from vtd_tpu.ops.nms import temporal_dedup
from vtd_tpu.runtime.pipeline import VideoTextPipeline

TRUTH = ["HELLO", "WORLD", "123"]


def make_clip(path: str) -> None:
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30.0, (640, 640))
    for _ in range(60):
        frame = np.full((640, 640, 3), 230, np.uint8)
        for k, word in enumerate(TRUTH):
            cv2.putText(
                frame, word, (80, 160 + 160 * k),
                cv2.FONT_HERSHEY_SIMPLEX, 2.0, (0, 0, 0), 3,
            )
        w.write(frame)
    w.release()


def main() -> None:
    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "verify.mp4")
        make_clip(clip)
        pipeline = VideoTextPipeline(
            detector_path=args.detector,
            recognizer_path=args.trocr if args.transformer else args.crnn,
            use_transformer_ocr=args.transformer,
            confidence_threshold=0.5,
            batch_size=8,
        )
        result = asyncio.run(pipeline.process_video(clip, td))
    assert result["status"] == "success", result
    tracks = temporal_dedup(result["results"])
    tracks.sort(key=lambda t: (-t["count"], t["text"]))
    for t in tracks:
        t = dict(t)
        t["real"] = t["text"] in TRUTH
        print(json.dumps(t))
    # per-detection confidence spread for junk vs real reads
    real_conf, junk_conf = [], []
    for fr in result["results"]:
        for d in fr["detections"]:
            (real_conf if d["text"].strip() in TRUTH else junk_conf).append(
                round(float(d["recognition_confidence"]), 3)
            )
    print("real rec-conf:", f"n={len(real_conf)}",
          f"min={min(real_conf) if real_conf else None}",
          f"mean={np.mean(real_conf).round(3) if real_conf else None}")
    print("junk rec-conf:", f"n={len(junk_conf)}",
          f"max={max(junk_conf) if junk_conf else None}",
          f"mean={np.mean(junk_conf).round(3) if junk_conf else None}",
          sorted(junk_conf)[-8:] if junk_conf else [])


if __name__ == "__main__":
    main()
