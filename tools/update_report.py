"""Refresh demo_models2/report.json e2e + trocr sections in place.

Re-runs both OCR engines on the procedural HELLO/WORLD/123 demo clip
(same generator as examples/train_and_verify.py:224-241) with the
current demo checkpoints and records the measured summaries; the trocr
section is updated from a finished ``train-trocr`` CLI log line passed
via --trocr-log. Training sections for CRNN/DBNet are left untouched
(those checkpoints are unchanged).

Run (TPU, sequential with other chip work):
  python tools/update_report.py --trocr demo_models2/trocr_r4c/trocr_final \
      --trocr-log /tmp/r4q/trocr_c.log
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

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


def run_engine(detector: str, recognizer: str, transformer: bool) -> dict:
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    with tempfile.TemporaryDirectory() as td:
        clip = os.path.join(td, "demo.mp4")
        make_clip(clip)
        pipeline = VideoTextPipeline(
            detector_path=detector,
            recognizer_path=recognizer,
            use_transformer_ocr=transformer,
            confidence_threshold=0.5,
            batch_size=8,
        )
        result = asyncio.run(pipeline.process_video(clip, td))
    assert result["status"] == "success", result
    s = result["summary"]
    detected = set(s["detected_texts"])
    out = {
        "frames": s["total_frames"],
        "detections": s["total_detections"],
        "detected_texts": sorted(detected)[:10],
        "truth": TRUTH,
        "exact_matches": sum(1 for t in TRUTH if t in detected),
        "clean": detected == set(TRUTH),
    }
    if not transformer:
        confs = [
            d["detection_confidence"]
            for fr in result["results"]
            for d in fr["detections"]
        ]
        out["avg_det_conf"] = round(float(np.mean(confs)), 3) if confs else 0.0
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--report", default="demo_models2/report.json")
    ap.add_argument("--detector", default="demo_models2/dbnet/best_bf16")
    ap.add_argument("--crnn", default="demo_models2/crnn/crnn_final")
    ap.add_argument("--trocr", default="models/text_recognizer_trocr")
    ap.add_argument("--trocr-log", default="",
                    help="train-trocr CLI log; its final JSON line "
                    "refreshes the trocr section")
    args = ap.parse_args()

    with open(args.report) as f:
        report = json.load(f)

    report["e2e"] = run_engine(args.detector, args.crnn, transformer=False)
    print(json.dumps({"e2e": report["e2e"]}), flush=True)
    report["e2e_transformer"] = run_engine(
        args.detector, args.trocr, transformer=True
    )
    print(json.dumps({"e2e_transformer": report["e2e_transformer"]}),
          flush=True)

    if args.trocr_log and os.path.exists(args.trocr_log):
        last = None
        with open(args.trocr_log) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{") and "heldout" in line:
                    last = json.loads(line)
        if last:
            report["trocr"] = {
                "checkpoint": last.get("best_model_path"),
                "final_loss": last.get("final_loss"),
                "epochs": last.get("epochs_trained"),
                "heldout_exact_match_random8":
                    last.get("heldout_exact_match_random8"),
                "heldout_char_accuracy_random8":
                    last.get("heldout_char_accuracy_random8"),
            }
            print(json.dumps({"trocr": report["trocr"]}), flush=True)

    with open(args.report, "w") as f:
        json.dump(report, f, indent=1)
    print("REPORT UPDATED", flush=True)


if __name__ == "__main__":
    main()
