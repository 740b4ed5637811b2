"""Evaluate a TrOCR checkpoint on the demo-quality heldout slice.

Same protocol as the train-trocr CLI's final report
(vtd_tpu/__main__.py): 32 random max-length (8-char) strings, disjoint
seed 424242 — the number tracked as ``heldout_exact_match_random8`` in
demo_models2/report.json. Use to score autosaves from a killed run
before deciding promotion:

    python tools/eval_trocr_ckpt.py demo_models2/trocr_r5/trocr_autosave_b \
        --config demo_models2/trocr_r5/trocr_final_config.json
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("ckpt", help="orbax checkpoint dir")
    parser.add_argument("--config", default="",
                        help="sidecar config json (default: "
                             "<ckpt_dir>/trocr_final_config.json)")
    args = parser.parse_args()

    from vtd_tpu.models.trocr import TrOCR
    from vtd_tpu.train.checkpoint import restore_variables
    from vtd_tpu.train.trocr_trainer import (
        TrOCRTrainer,
        load_config,
        synthesize_trocr_crops,
    )

    import os
    cfg_path = args.config or os.path.join(
        os.path.dirname(args.ckpt.rstrip("/")), "trocr_final_config.json"
    )
    cfg = load_config(cfg_path)
    params = restore_variables(args.ckpt)["params"]
    model = TrOCR(cfg)
    trainer = TrOCRTrainer({}, model_config=cfg)
    h_img, h_txt = synthesize_trocr_crops(
        32, cfg, seed=424242, length_range=(8, 9)
    )
    ev = trainer.evaluate(model, params, h_img, h_txt)
    out = {
        "ckpt": args.ckpt,
        "heldout_exact_match_random8": "%d/32" % round(
            ev["val_exact_match"] * 32
        ),
        "heldout_char_accuracy_random8": ev["val_char_accuracy"],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
