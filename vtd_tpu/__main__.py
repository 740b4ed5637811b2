"""vtd_tpu command-line interface.

  python -m vtd_tpu process <video> [--crnn] [--threshold 0.5] [--out r.json]
  python -m vtd_tpu serve [--host H] [--port P]
  python -m vtd_tpu train-detector ...    (see train/train_detector.py)
  python -m vtd_tpu train-recognizer ...  (see train/train_recognizer.py)
"""
from __future__ import annotations

import argparse
import asyncio
import json
import sys


def _cmd_process(argv):
    parser = argparse.ArgumentParser(prog="vtd_tpu process")
    parser.add_argument("video")
    parser.add_argument("--crnn", action="store_true",
                        help="use CRNN recognizer instead of transformer")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--fps", type=float, default=10.0)
    parser.add_argument("--detector", default="", help="detector checkpoint")
    parser.add_argument("--recognizer", default="", help="recognizer checkpoint")
    parser.add_argument("--out", default="", help="write JSON result here")
    parser.add_argument("--format", default="json",
                        choices=["json", "csv", "xml"])
    args = parser.parse_args(argv)

    from .runtime.pipeline import VideoTextPipeline

    pipeline = VideoTextPipeline(
        detector_path=args.detector or None,
        recognizer_path=args.recognizer or None,
        use_transformer_ocr=not args.crnn,
        confidence_threshold=args.threshold,
        batch_size=args.batch_size,
        target_fps=args.fps,
    )
    result = asyncio.run(pipeline.process_video(args.video, "."))

    if args.format == "json":
        payload = json.dumps(result, indent=2, default=str)
    else:
        from .serve.services.processing_service import ProcessingService

        svc = ProcessingService()
        if args.format == "csv":
            payload = asyncio.run(svc.export_results_csv(result))
        else:
            payload = asyncio.run(svc.export_results_xml(result))

    if args.out:
        with open(args.out, "w") as f:
            f.write(payload)
        print(f"wrote {args.out}")
    else:
        print(payload)
    return 0 if result.get("status") == "success" else 1


def main():
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "process":
        return _cmd_process(rest)
    if cmd == "serve":
        sys.argv = ["vtd_tpu.serve"] + rest
        from .serve.app import main as serve_main

        return serve_main()
    if cmd == "train-detector":
        from .train.train_detector import main as td_main

        td_main(rest)
        return 0
    if cmd == "train-recognizer":
        from .train.train_recognizer import main as tr_main

        tr_main(rest)
        return 0
    print(f"unknown command {cmd!r}\n{__doc__}")
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
