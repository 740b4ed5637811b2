#!/bin/bash
# Round-4 final TPU queue — run AFTER demo_models2/trocr_r4d training
# lands and nothing else is using the chip. STRICTLY SEQUENTIAL (two
# concurrent TPU clients wedge the relay); keep the host otherwise
# idle during bench steps.
#
#   bash tools/r4d_queue.sh
#
# Steps:
#   1. promote the r4d TrOCR checkpoint to models/text_recognizer_trocr
#      ONLY if its heldout beats the incumbent (gate below)
#   2. verify_checkpoints with the promoted TrOCR (clean-equality gate)
#   3. refresh demo_models2/report.json (both engines + trocr section)
#   4. bench configs 3, 5, 4, 1, 2 + device-resident
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
Q=/tmp/r4q

echo "== r4d training result =="
tail -1 $Q/trocr_d.log

echo "== 1. promote checkpoint =="
python - <<'EOF'
import json, shutil, sys
last = None
for line in open("/tmp/r4q/trocr_d.log"):
    line = line.strip()
    if line.startswith("{") and "heldout" in line:
        last = json.loads(line)
score = -1
if last and last.get("status") == "success":
    score = int(last["heldout_exact_match_random8"].split("/")[0])
    print(f"r4d heldout: {score}/32")
# Promote the best available over the shipped incumbent (the round-3
# square-64 checkpoint, 21/32): r4d if it wins, else r4b (22/32).
src = "demo_models2/trocr_r4d" if score >= 22 else "demo_models2/trocr_r4b"
print(f"promoting {src} -> models/text_recognizer_trocr")
shutil.rmtree("models/text_recognizer_trocr", ignore_errors=True)
shutil.copytree(f"{src}/trocr_final", "models/text_recognizer_trocr")
shutil.copy(f"{src}/trocr_final_config.json",
            "models/text_recognizer_trocr_config.json")
EOF

echo "== 2. verify checkpoints (both engines) =="
timeout 900 python examples/verify_checkpoints.py > $Q/verify_r4d.log 2>&1
tail -3 $Q/verify_r4d.log
grep -q "VERIFY PASS" $Q/verify_r4d.log || { echo "VERIFY FAILED"; exit 1; }

echo "== 3. refresh report.json =="
timeout 900 python tools/update_report.py --trocr-log $Q/trocr_d.log \
  > $Q/report_refresh.log 2>&1
tail -4 $Q/report_refresh.log

echo "== 4. benches =="
for c in 3 5 4 1 2; do
  timeout 1500 python bench.py --config $c 2>$Q/r4dbench$c.err \
    | tail -1 | tee $Q/r4dbench$c.json
done
timeout 1500 python bench.py --device-resident 2>$Q/r4dbenchdr.err \
  | tail -1 | tee $Q/r4dbenchdr.json
echo "QUEUE DONE"
