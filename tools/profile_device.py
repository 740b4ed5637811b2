"""Per-stage DEVICE time profiler for the fused pipeline (TPU).

Wall-clock timing lies on relayed/async backends (dispatch returns
before the device runs; syncs carry unrelated queue time), so this tool
measures stage cost from the `jax.profiler` device timeline instead:
each stage is jitted under a distinct name, run N times, and its
TPU-lane durations summed from the trace.

Usage (on a TPU host):
    python tools/profile_device.py [--batch 8] [--iters 10] \
        [--detector demo_models2/dbnet/best_bf16] \
        [--recognizer demo_models2/crnn/crnn_final]

Stages reported:
    pre        uint8 -> normalized float frames (ops/preprocess)
    fwd        DBNet forward (models/dbnet)
    post_cc    db_postprocess through connected components
    post_topk  + component areas / top-K selection
    post_bnd   + boundary compaction (per-component pixel tables)
    post_full  full db_postprocess (calipers + scores included)
    crop       crop_and_resize of all K slots
    crnn       CRNN + CTC greedy decode over all B*K crops
    fused      the production single-dispatch program (runtime/pipeline)

The incremental cost of each postprocess phase is the difference
between consecutive post_* rows (they re-run the earlier phases).
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _device_durations(trace_dir: str) -> "dict[str, float]":
    path = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )[-1]
    with gzip.open(path) as f:
        tr = json.load(f)
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in tr["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dur: "dict[str, float]" = collections.defaultdict(float)
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and pids.get(e.get("pid"), "").startswith(
            "/device"
        ):
            nm = e.get("name", "")
            if nm.startswith("jit_STAGE_"):
                dur[nm.split("(")[0][len("jit_STAGE_"):]] += e.get("dur", 0)
    return dur


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--detector", default="demo_models2/dbnet/best_bf16")
    ap.add_argument("--recognizer", default="demo_models2/crnn/crnn_final")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vtd_tpu.ops.crop import crop_and_resize_boxes_mm
    from vtd_tpu.ops.ctc import ctc_greedy_decode_arrays
    from vtd_tpu.ops.db_postprocess import db_postprocess
    from vtd_tpu.ops.preprocess import preprocess_frames
    from vtd_tpu.runtime.pipeline import VideoTextPipeline

    B = args.batch
    det = args.detector if os.path.exists(args.detector) else None
    rec = args.recognizer if os.path.exists(args.recognizer) else None
    p = VideoTextPipeline(
        use_transformer_ocr=False, batch_size=B, max_dets=64,
        detector_path=det, recognizer_path=rec, transfer_format="bgr",
    )
    model, size, crnn = p.detector.model, p.detector.input_size, (
        p.recognizer.crnn
    )
    rng = np.random.default_rng(0)
    dev = jax.device_put(
        rng.integers(0, 255, (B, 640, 640, 3), np.uint8)
    )
    jax.block_until_ready(dev)
    dv, rv = p.detector.variables, p.recognizer.crnn_variables
    thr = jax.device_put(jnp.float32(0.5))

    def named(name, fn):
        fn.__name__ = "STAGE_" + name
        return jax.jit(fn)

    def post_stage(stage):
        def f(pr, t):
            return jax.vmap(
                lambda m: db_postprocess(m, t, max_dets=64, stage=stage)
            )(pr)
        return f

    stages = {
        "pre": named("pre", lambda f: preprocess_frames(f, out_size=size)),
        "fwd": named(
            "fwd", lambda v, x: model.apply(v, x)["probability"][..., 0]
        ),
        "post_cc": named("post_cc", post_stage("cc")),
        "post_topk": named("post_topk", post_stage("topk")),
        "post_bnd": named("post_bnd", post_stage("boundary")),
        "post_full": named("post_full", post_stage("full")),
        "crop": named(
            "crop",
            lambda f, po: jax.vmap(
                lambda fr, bx, vl: crop_and_resize_boxes_mm(
                    fr, bx, vl, out_h=32, out_w=128
                )
            )(f, po["boxes"], po["valid"]),
        ),
        "crnn": named(
            "crnn",
            lambda v, c: ctc_greedy_decode_arrays(
                crnn.apply(v, c.reshape(B * 64, 32, 128, 3))
            ),
        ),
    }

    # warm compiles
    x = stages["pre"](dev)
    prob = stages["fwd"](dv, x)
    o_cc = stages["post_cc"](prob, thr)
    o_tk = stages["post_topk"](prob, thr)
    o_bd = stages["post_bnd"](prob, thr)
    po = stages["post_full"](prob, thr)
    cr = stages["crop"](dev, po)
    ct = stages["crnn"](rv, cr)
    fused = p.dispatch_batch(dev)
    jax.block_until_ready(
        (o_cc["labels"], o_tk["roots"], o_bd["pmask"], ct["ids"], fused[0])
    )

    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            last = None
            for _ in range(args.iters):
                x = stages["pre"](dev)
                prob = stages["fwd"](dv, x)
                o_cc = stages["post_cc"](prob, thr)
                o_tk = stages["post_topk"](prob, thr)
                o_bd = stages["post_bnd"](prob, thr)
                po = stages["post_full"](prob, thr)
                cr = stages["crop"](dev, po)
                ct = stages["crnn"](rv, cr)
                last = (o_cc["labels"], o_tk["roots"], o_bd["pmask"],
                        ct["ids"])
            jax.block_until_ready(last)
        dur = _device_durations(td)

    # the production fused program, traced separately for a clean line
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            h = None
            for _ in range(args.iters):
                h = p.dispatch_batch(dev)
            jax.block_until_ready(h[0])
        path = sorted(
            glob.glob(os.path.join(td, "plugins/profile/*/*.trace.json.gz"))
        )[-1]
        with gzip.open(path) as f:
            tr = json.load(f)
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in tr["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        fused_ms = sum(
            e.get("dur", 0)
            for e in tr["traceEvents"]
            if e.get("ph") == "X"
            and pids.get(e.get("pid"), "").startswith("/device")
            and e.get("name", "").startswith("jit_run")
        ) / args.iters / 1000

    n = args.iters
    print(f"# device ms per {B}-frame batch ({n} iters)")
    for k in ("pre", "fwd", "post_cc", "post_topk", "post_bnd",
              "post_full", "crop", "crnn"):
        print(f"{k:10} {dur.get(k, 0) / n / 1000:8.2f} ms")
    print(f"{'fused':10} {fused_ms:8.2f} ms  (production single-dispatch)")


if __name__ == "__main__":
    main()
