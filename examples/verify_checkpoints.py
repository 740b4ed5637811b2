"""Re-verify the shipped demo checkpoints end-to-end (no training).

Builds the full pipeline from existing checkpoints, runs it on a fresh
procedurally generated clip with burned-in text, and asserts every
string is read exactly — through the CRNN path and (when a transformer
checkpoint is given) the TrOCR path. This is the fast regression gate
for postprocess/pipeline changes: examples/train_and_verify.py does the
same but retrains first (~20 min TPU).

Run:  python examples/verify_checkpoints.py \
          [--detector demo_models2/dbnet/best_bf16] \
          [--crnn demo_models2/crnn/crnn_final] \
          [--trocr models/text_recognizer_trocr]
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/vtd_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import cv2

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


def verify(detector: str, recognizer: str, use_transformer: bool) -> dict:
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "verify.mp4")
        make_clip(clip)
        pipeline = VideoTextPipeline(
            detector_path=detector,
            recognizer_path=recognizer,
            use_transformer_ocr=use_transformer,
            confidence_threshold=0.5,
            batch_size=8,
        )
        result = asyncio.run(pipeline.process_video(clip, td))
    assert result["status"] == "success", result
    s = result["summary"]
    detected = set(s["detected_texts"])
    return {
        "engine": "transformer" if use_transformer else "crnn",
        "frames": s["total_frames"],
        "detections": s["total_detections"],
        "detected_texts": sorted(detected)[:10],
        "exact_matches": sum(1 for t in TRUTH if t in detected),
        # equality, not just containment: junk tracks (e.g. the
        # frame-border artifact box) must not reach the summary
        "clean": detected == set(TRUTH),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--detector", default="demo_models2/dbnet/best_bf16")
    ap.add_argument("--crnn", default="demo_models2/crnn/crnn_final")
    ap.add_argument("--trocr", default="models/text_recognizer_trocr")
    args = ap.parse_args()

    ok = True
    r = verify(args.detector, args.crnn, use_transformer=False)
    print(json.dumps(r), flush=True)
    ok &= r["exact_matches"] == len(TRUTH) and r["clean"]
    if args.trocr and os.path.exists(args.trocr):
        r = verify(args.detector, args.trocr, use_transformer=True)
        print(json.dumps(r), flush=True)
        ok &= r["exact_matches"] == len(TRUTH) and r["clean"]
    print("VERIFY", "PASS" if ok else "FAIL", flush=True)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
