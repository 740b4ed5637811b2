#!/bin/bash
# Round-5 contingency: if the first continuation (tools/r5_tpu_queue.sh)
# lands past the incumbent but short of the 28/32 heldout bar, continue
# ANOTHER 45 fresh-draw epochs from its best candidate, then re-score,
# re-promote, re-verify, and refresh the report. STRICTLY SEQUENTIAL
# with any other chip work.
#
#   bash tools/r5b_continue.sh [init_ckpt]   # default: trocr_r5/trocr_final
set -u
cd "$(dirname "$0")/.."
Q=/tmp/r5q
mkdir -p $Q
INIT=${1:-demo_models2/trocr_r5/trocr_final}

probe() {
  timeout 60 python -c "
from vtd_tpu.core.tpu_preflight import bounded_device_count
import sys; sys.exit(0 if bounded_device_count() > 0 else 1)
" >/dev/null 2>&1
}
probe || { echo "TPU relay unreachable; aborting" | tee $Q/ABORT_B; exit 1; }

echo "== 1b. TrOCR continuation B: 45 more fresh-draw epochs from $INIT =="
timeout 9000 python -m vtd_tpu train-trocr \
  --samples 32768 --epochs 45 --batch-size 256 --lr 2e-4 --fresh-data \
  --init-from "$INIT" \
  --checkpoint-dir demo_models2/trocr_r5b > $Q/trocr_r5b.log 2>&1
tail -1 $Q/trocr_r5b.log

echo "== 2b. score all candidates and promote the best past the current champion =="
BEST=$(python - <<'EOF'
import json
best = 22
try:
    cur = json.load(open("demo_models2/report.json"))["trocr"]
    best = int(cur["heldout_exact_match_random8"].split("/")[0])
except Exception:
    pass
print(best)
EOF
)
python tools/r5_promote.py demo_models2/trocr_r5b --incumbent-score "$BEST" --promote \
  || { echo "no promotion; incumbent stands, skipping verify/report"; exit 0; }

echo "== 3b. verify both engines =="
timeout 900 python examples/verify_checkpoints.py > $Q/verify_r5b.log 2>&1
tail -3 $Q/verify_r5b.log
grep -q "VERIFY PASS" $Q/verify_r5b.log || { echo "VERIFY FAILED"; exit 1; }

echo "== 4b. refresh report.json =="
timeout 900 python tools/update_report.py --trocr-log $Q/trocr_r5b.log \
  > $Q/report_refresh_b.log 2>&1
tail -4 $Q/report_refresh_b.log
echo "QUEUE B DONE"
