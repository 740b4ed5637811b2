#!/bin/bash
# Round-5 TPU work queue — TrOCR past the 28/32 heldout bar, then
# re-verify + bench. Run when the chip relay is healthy and idle.
# STRICTLY SEQUENTIAL (two concurrent TPU clients wedge the relay).
#
#   bash tools/r5_tpu_queue.sh
#
# Background (round 4): the 45-epoch fresh-draws run projected past the
# bar was OOM-killed at ~epoch 43 by the relay's per-transfer host
# buffer leak (docs/ARCHITECTURE.md "Relay transfer leak"). The trainer
# now ships uint8 crops (4x less leak: ~0.9 GB/epoch), checkpoints
# every 10 epochs, and supports --init-from continuation — so the same
# training volume is safe in one run, and recoverable if not.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5q
Q=/tmp/r5q

probe() {
  timeout 60 python -c "
from vtd_tpu.core.tpu_preflight import bounded_device_count
import sys; sys.exit(0 if bounded_device_count() > 0 else 1)
" >/dev/null 2>&1
}
probe || { echo "TPU relay unreachable; aborting" | tee $Q/ABORT; exit 1; }

echo "== 1. TrOCR continuation: 45 fresh-draw epochs from the r4b champion =="
timeout 9000 python -m vtd_tpu train-trocr \
  --samples 32768 --epochs 45 --batch-size 256 --lr 3e-4 --fresh-data \
  --init-from demo_models2/trocr_r4b/trocr_final \
  --checkpoint-dir demo_models2/trocr_r5 > $Q/trocr_r5.log 2>&1
tail -1 $Q/trocr_r5.log

echo "== 2. promote if it beats the incumbent (22/32) =="
python - <<'EOF'
import json, shutil, sys
last = None
for line in open("/tmp/r5q/trocr_r5.log"):
    line = line.strip()
    if line.startswith("{") and "heldout" in line:
        last = json.loads(line)
if not last or last.get("status") != "success":
    sys.exit("r5 training did not succeed; keeping incumbent")
score = int(last["heldout_exact_match_random8"].split("/")[0])
print(f"r5 heldout: {score}/32 (incumbent 22/32, target >=28)")
if score <= 22:
    sys.exit("no improvement; keeping incumbent")
shutil.rmtree("models/text_recognizer_trocr", ignore_errors=True)
shutil.copytree("demo_models2/trocr_r5/trocr_final",
                "models/text_recognizer_trocr")
shutil.copy("demo_models2/trocr_r5/trocr_final_config.json",
            "models/text_recognizer_trocr_config.json")
print("promoted demo_models2/trocr_r5 -> models/text_recognizer_trocr")
EOF

echo "== 3. verify both engines (clean-equality gate) =="
timeout 900 python examples/verify_checkpoints.py > $Q/verify_r5.log 2>&1
tail -3 $Q/verify_r5.log
grep -q "VERIFY PASS" $Q/verify_r5.log || { echo "VERIFY FAILED"; exit 1; }

echo "== 4. refresh report.json =="
timeout 900 python tools/update_report.py --trocr-log $Q/trocr_r5.log \
  > $Q/report_refresh.log 2>&1
tail -4 $Q/report_refresh.log

echo "== 5. benches (all configs; raw artifacts -> bench_artifacts/r5/) =="
VTD_BENCH_TAG=r5 timeout 9000 python bench.py --all \
  2>$Q/r5bench.err | tee $Q/r5bench.jsonl
echo "QUEUE DONE"
