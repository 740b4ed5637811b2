"""vtd_tpu command-line interface.

  python -m vtd_tpu process <video> [--crnn] [--threshold 0.5] [--out r.json]
  python -m vtd_tpu serve [--host H] [--port P]
  python -m vtd_tpu worker [--broker file:///shared/queue] [--concurrency N]
  python -m vtd_tpu train-detector ...    (see train/train_detector.py)
  python -m vtd_tpu train-recognizer ...  (see train/train_recognizer.py)
  python -m vtd_tpu train-trocr ...       (see train/trocr_trainer.py)
"""
from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys

# Honor JAX_PLATFORMS at the config level, not just the env level: this
# image's sitecustomize registers the axon TPU plugin for every
# interpreter, and plugin discovery can initialize it (dialing the
# remote chip) even when the env var says cpu — which turns
# "JAX_PLATFORMS=cpu python -m vtd_tpu ..." into a hang whenever the
# chip relay is unreachable. jax.config.update pins the platform before
# any backend is instantiated (same pattern as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _cmd_process(argv):
    parser = argparse.ArgumentParser(prog="vtd_tpu process")
    parser.add_argument("video")
    parser.add_argument("--crnn", action="store_true",
                        help="use CRNN recognizer instead of transformer")
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--min-rec-confidence", type=float, default=0.0,
                        help="drop transcripts with OCR confidence below "
                             "this (0.0 = reference parity, never filters)")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--fps", type=float, default=10.0)
    parser.add_argument("--detector", default="", help="detector checkpoint")
    parser.add_argument("--recognizer", default="", help="recognizer checkpoint")
    parser.add_argument("--input-size", type=int, default=640,
                        help="detector input resolution")
    parser.add_argument("--sample-mode", default="stride",
                        choices=["stride", "keyframe"],
                        help="keyframe: only scene-change frames hit the device")
    parser.add_argument("--temporal-dedup", action="store_true",
                        help="cross-frame text tracks in the summary")
    parser.add_argument("--max-dets", type=int, default=64,
                        help="per-frame detection slot count (smaller "
                             "compiles faster; CI smoke tests use 8)")
    parser.add_argument("--out", default="", help="write JSON result here")
    parser.add_argument("--format", default="json",
                        choices=["json", "csv", "xml"])
    parser.add_argument("--data-parallel", type=int, default=0, metavar="N",
                        help="shard frame batches over an N-chip data "
                             "mesh (0 = single device)")
    parser.add_argument("--two-stage", action="store_true",
                        help="pipeline parallelism: detect on half the "
                             "chips, recognize on the other half")
    args = parser.parse_args(argv)

    from .runtime.pipeline import VideoTextPipeline

    mesh = None
    if args.data_parallel:
        import jax

        from .core.mesh import make_mesh

        mesh = make_mesh(
            n_data=args.data_parallel, n_model=1,
            devices=jax.devices()[: args.data_parallel],
        )
    pipeline = VideoTextPipeline(
        detector_path=args.detector or None,
        recognizer_path=args.recognizer or None,
        use_transformer_ocr=not args.crnn,
        confidence_threshold=args.threshold,
        min_recognition_confidence=args.min_rec_confidence,
        batch_size=args.batch_size,
        target_fps=args.fps,
        detector_input_size=args.input_size,
        sample_mode=args.sample_mode,
        temporal_dedup=args.temporal_dedup,
        max_dets=args.max_dets,
        mesh=mesh,
        parallel_mode="two_stage" if args.two_stage else "fused",
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


def _cmd_worker(argv):
    """Dedicated worker process: drain a shared broker queue (the
    reference's `celery -A app.celery_app worker` counterpart). Run one
    per TPU host; each initializes jax.distributed when configured."""
    parser = argparse.ArgumentParser(prog="vtd_tpu worker")
    parser.add_argument("--broker", default="",
                        help="broker URL, e.g. file:///shared/queue or "
                             "tcp://brokerhost:6380 "
                             "(default: settings.celery_broker_url)")
    parser.add_argument("--concurrency", type=int, default=2)
    args = parser.parse_args(argv)

    from .core.config import settings
    from .core.mesh import init_distributed

    if args.broker:
        settings.celery_broker_url = args.broker
    init_distributed()

    # rebind the module-level queue to the requested broker
    from .serve import queue as queue_mod

    broker = queue_mod._broker_from_settings()
    if broker is None:
        print("worker requires a non-local broker (e.g. file:///shared/q)")
        return 2
    queue_mod.task_queue.broker = broker
    queue_mod.task_queue.concurrency = args.concurrency

    from .serve import tasks  # registers process_video_task etc.

    tasks.register_beat_schedule()
    queue_mod.task_queue.start_workers()
    print(f"worker draining {settings.celery_broker_url} "
          f"(concurrency={args.concurrency}); Ctrl-C to stop")
    import time as _time

    try:
        while True:
            _time.sleep(1.0)
    except KeyboardInterrupt:
        queue_mod.task_queue.shutdown()
        return 0


def _cmd_train_trocr(argv):
    parser = argparse.ArgumentParser(prog="vtd_tpu train-trocr")
    parser.add_argument("--samples", type=int, default=8192)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--lr", type=float, default=6e-4)
    parser.add_argument("--weight-decay", type=float, default=1e-4)
    parser.add_argument("--image-size", type=int, default=48,
                        help="crop height fed to the encoder")
    parser.add_argument("--image-width", type=int, default=192,
                        help="crop width (text-shaped rectangle; "
                        "0 = square like HF ViT)")
    parser.add_argument(
        "--no-augment", action="store_true",
        help="disable on-device photometric augmentation",
    )
    parser.add_argument(
        "--fresh-data", action="store_true",
        help="draw a FRESH --samples-sized training set every epoch "
        "(host-rendered on a prefetch thread) instead of reusing one "
        "fixed set — a fixed set saturates heldout accuracy once the "
        "model memorizes it",
    )
    parser.add_argument("--enc-dim", type=int, default=0,
                        help="override encoder/decoder width (0 = demo "
                        "default 128)")
    parser.add_argument("--layers", type=int, default=0,
                        help="override encoder/decoder depth (0 = demo "
                        "default 4)")
    parser.add_argument("--checkpoint-dir", default="./models")
    parser.add_argument("--init-from", default="",
                        help="continue training from this checkpoint's "
                        "weights (fresh optimizer; pick a lower --lr "
                        "than the original run)")
    args = parser.parse_args(argv)

    from .train.trocr_trainer import (
        TrOCRTrainer,
        demo_config,
        synthesize_trocr_crops,
    )

    dims = {}
    if args.enc_dim:
        dims.update(
            enc_dim=args.enc_dim, dec_dim=args.enc_dim,
            enc_mlp=2 * args.enc_dim, dec_mlp=2 * args.enc_dim,
        )
    if args.layers:
        dims.update(enc_layers=args.layers, dec_layers=args.layers)
    cfg = demo_config(
        image_size=args.image_size, image_width=args.image_width, **dims
    )
    images, texts = synthesize_trocr_crops(args.samples, cfg, seed=0)
    val_images, val_texts = synthesize_trocr_crops(512, cfg, seed=999)
    trainer = TrOCRTrainer(
        {
            "checkpoint_dir": args.checkpoint_dir,
            "max_epochs": args.epochs,
            "batch_size": args.batch_size,
            "learning_rate": args.lr,
            "weight_decay": args.weight_decay,
            "augment": not args.no_augment,
            "init_from": args.init_from or None,
        },
        model_config=cfg,
    )
    data_fn = None
    if args.fresh_data:
        # disjoint seed block per epoch (heldout uses 999 / 424242)
        data_fn = lambda epoch: synthesize_trocr_crops(  # noqa: E731
            args.samples, cfg, seed=100_000 + epoch
        )
    out = trainer.train(images, texts, val_images, val_texts,
                        data_fn=data_fn)
    if out.get("status") == "success":
        # The hardest held-out slice: random max-length (8-char)
        # strings, disjoint seed — the demo-quality bar tracked in
        # demo_models2/report.json as heldout_exact_match_random8.
        from .models.trocr import TrOCR
        from .train.checkpoint import restore_variables

        h_img, h_txt = synthesize_trocr_crops(
            32, cfg, seed=424242, length_range=(8, 9)
        )
        model = TrOCR(cfg)
        params = restore_variables(out["best_model_path"])["params"]
        ev = trainer.evaluate(model, params, h_img, h_txt)
        out["heldout_exact_match_random8"] = "%d/32" % round(
            ev["val_exact_match"] * 32
        )
        out["heldout_char_accuracy_random8"] = ev["val_char_accuracy"]
    print(json.dumps({k: v for k, v in out.items() if k != "history"}))
    return 0 if out.get("status") == "success" else 1


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
    if cmd == "worker":
        return _cmd_worker(rest)
    if cmd == "brokerd":
        # Network task broker daemon (no JAX import — runs on any box)
        from .serve.brokerd import main as brokerd_main

        brokerd_main(rest)
        return 0
    if cmd.startswith("train"):
        # Trainers report per-epoch progress via logging.info; without a
        # handler a multi-hour run is silent until the final JSON line
        # (round-4 retrains were unmonitorable for exactly this reason).
        import logging

        logging.basicConfig(
            level=logging.WARNING,
            format="%(asctime)s %(name)s: %(message)s",
        )
        # Epoch lines only — absl/orbax INFO would drown them out.
        logging.getLogger("vtd_tpu").setLevel(logging.INFO)
    if cmd == "train-trocr":
        return _cmd_train_trocr(rest)
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
