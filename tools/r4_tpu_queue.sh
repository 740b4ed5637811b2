#!/bin/bash
# Round-4 TPU work queue — run ONCE the chip relay is reachable.
# STRICTLY SEQUENTIAL: two concurrent TPU clients wedge the relay.
# Each step logs to /tmp/r4q/. Keep the host otherwise idle during the
# bench steps (1-core host; concurrent CPU load distorts fps numbers).
#
#   bash tools/r4_tpu_queue.sh
#
# Steps:
#   1. parity gate   (verify_checkpoints, both OCR engines, 3/3 required)
#   2. bench config 3  x3 consecutive (>=10.0 vs_baseline each)
#   3. bench --device-resident (>=350 fps target)
#   4. bench configs 4, 5, 1, 2  (4 and 5 must clear 100 fps this round)
#   5. TrOCR retrain with augmentation (target >=28/32 heldout random-8)
#   6. re-verify transformer path with the new checkpoint
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
Q=/tmp/r4q

probe() {
  timeout 60 python -c "
from vtd_tpu.core.tpu_preflight import bounded_device_count
import sys; sys.exit(0 if bounded_device_count() > 0 else 1)
" >/dev/null 2>&1
}

if ! probe; then
  echo "TPU relay unreachable; aborting queue" | tee $Q/ABORT
  exit 1
fi

echo "== 1. parity gate =="
timeout 900 python examples/verify_checkpoints.py > $Q/verify1.log 2>&1
grep -q "VERIFY PASS" $Q/verify1.log || { echo "GATE FAILED"; tail -5 $Q/verify1.log; exit 1; }
echo "gate pass"

echo "== 2. bench config 3 x3 =="
for i in 1 2 3; do
  timeout 1500 python bench.py 2>$Q/bench$i.err | tail -1 | tee $Q/bench$i.json
done

echo "== 3. device-resident =="
timeout 1500 python bench.py --device-resident 2>$Q/benchdr.err | tail -1 | tee $Q/benchdr.json

echo "== 4. configs 4, 5, 1, 2 =="
for c in 4 5 1 2; do
  timeout 1500 python bench.py --config $c 2>$Q/benchc$c.err | tail -1 | tee $Q/benchc$c.json
done

echo "== 5. TrOCR retrain =="
timeout 4500 python -m vtd_tpu train-trocr \
  --samples 32768 --epochs 25 --batch-size 256 --lr 6e-4 \
  --checkpoint-dir demo_models2/trocr_r4 > $Q/trocr.log 2>&1
tail -1 $Q/trocr.log

echo "== 6. e2e transformer verify with new ckpt =="
timeout 900 python examples/verify_checkpoints.py \
  --trocr demo_models2/trocr_r4/trocr_final > $Q/verify2.log 2>&1 || true
tail -2 $Q/verify2.log
echo "QUEUE DONE"
