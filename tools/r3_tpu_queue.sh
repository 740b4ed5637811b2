#!/bin/bash
# Round-3 TPU work queue — run ONCE the chip relay is reachable.
# STRICTLY SEQUENTIAL: two concurrent TPU clients wedge the relay
# (see memory/vtd-tpu-build-context.md). Each step logs to /tmp/r3q/.
#
#   bash tools/r3_tpu_queue.sh
#
# Steps:
#   1. parity gate  (verify_checkpoints, both OCR engines, 3/3 required)
#   2. bench config 3  x3 consecutive (>=10.0 vs_baseline each)
#   3. bench --device-resident (>=350 fps target)
#   4. TrOCR retrain with augmentation (target >=28/32 heldout random-8)
#   5. re-verify transformer path with the new checkpoint
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r3q
Q=/tmp/r3q

probe() {
  timeout 60 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

if ! probe; then
  echo "TPU relay unreachable; aborting queue" | tee $Q/ABORT
  exit 1
fi

echo "== 1. parity gate =="
timeout 900 python examples/verify_checkpoints.py > $Q/verify1.log 2>&1
grep -q "VERIFY PASS" $Q/verify1.log || { echo "GATE FAILED"; exit 1; }
echo "gate pass"

echo "== 2. bench config 3 x3 =="
for i in 1 2 3; do
  timeout 1500 python bench.py 2>$Q/bench$i.err | tail -1 | tee $Q/bench$i.json
done

echo "== 3. device-resident =="
timeout 1500 python bench.py --device-resident 2>$Q/benchdr.err | tail -1 | tee $Q/benchdr.json

echo "== 4. TrOCR retrain =="
timeout 3600 python -m vtd_tpu train-trocr \
  --samples 32768 --epochs 25 --batch-size 256 --lr 6e-4 \
  --checkpoint-dir demo_models2/trocr_r3 > $Q/trocr.log 2>&1
tail -1 $Q/trocr.log

echo "== 5. e2e transformer verify with new ckpt =="
timeout 900 python examples/verify_checkpoints.py \
  --trocr demo_models2/trocr_r3/trocr_final > $Q/verify2.log 2>&1 || true
tail -2 $Q/verify2.log
echo "QUEUE DONE"
