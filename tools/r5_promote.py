"""Score round-5 TrOCR candidates and promote the best past the
incumbent.

Evaluates every checkpoint in the given training dir (trocr_final +
autosaves) on the heldout random-8 protocol, prints a table, and — with
``--promote`` — copies the best one over ``models/text_recognizer_trocr``
when it beats ``--incumbent-score`` (default 22, the r4 champion).

    python tools/r5_promote.py demo_models2/trocr_r5 --promote
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def score(ckpt: str, cfg: str) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "eval_trocr_ckpt.py"),
         ckpt, "--config", cfg],
        capture_output=True, text=True, timeout=900, cwd=REPO,
    )
    for line in reversed(out.stdout.splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(f"eval failed for {ckpt}: {out.stderr[-500:]}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("train_dir")
    parser.add_argument("--incumbent-score", type=int, default=22)
    parser.add_argument("--promote", action="store_true")
    args = parser.parse_args()

    cfg = os.path.join(args.train_dir, "trocr_final_config.json")
    candidates = [
        os.path.join(args.train_dir, name)
        for name in ("trocr_final", "trocr_autosave_a", "trocr_autosave_b")
        if os.path.isdir(os.path.join(args.train_dir, name))
    ]
    if not candidates:
        print("no checkpoints found in", args.train_dir)
        return 1
    results = []
    for ckpt in candidates:
        try:
            r = score(ckpt, cfg)
        except Exception as e:  # noqa: BLE001
            print(f"{ckpt}: eval failed: {e}")
            continue
        n = int(r["heldout_exact_match_random8"].split("/")[0])
        results.append((n, r["heldout_char_accuracy_random8"], ckpt))
        print(f"{ckpt}: {r['heldout_exact_match_random8']} "
              f"(char {r['heldout_char_accuracy_random8']:.4f})")
    if not results:
        return 1
    results.sort(reverse=True)
    best_n, best_char, best = results[0]
    print(f"\nbest: {best} at {best_n}/32 "
          f"(incumbent {args.incumbent_score}/32)")
    if not args.promote:
        return 0
    if best_n <= args.incumbent_score:
        print("no improvement; keeping incumbent")
        return 3
    dst = os.path.join(REPO, "models", "text_recognizer_trocr")
    shutil.rmtree(dst, ignore_errors=True)
    shutil.copytree(best, dst)
    shutil.copy(cfg, dst + "_config.json")
    print(f"promoted {best} -> {dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
