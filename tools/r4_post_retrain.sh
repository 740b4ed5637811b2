#!/bin/bash
# Round-4 post-retrain TPU queue — run AFTER demo_models2/trocr_r4b
# training lands and nothing else is using the chip. STRICTLY
# SEQUENTIAL (two concurrent TPU clients wedge the relay); keep the
# host otherwise idle during bench steps.
#
#   bash tools/r4_post_retrain.sh
#
# Steps:
#   1. heldout eval gate on the rect checkpoint (>=28/32 target)
#   2. verify_checkpoints with the rect TrOCR (clean-equality gate)
#   3. bench configs 3, 5 (engine batch path), 4, 1, 2
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4q
Q=/tmp/r4q

CKPT=demo_models2/trocr_r4b/trocr_final
[ -d "$CKPT" ] || { echo "no rect checkpoint at $CKPT"; exit 1; }

echo "== 1. heldout eval (from training log) =="
tail -1 $Q/trocr_rect.log

echo "== 2. verify with rect TrOCR =="
timeout 900 python examples/verify_checkpoints.py --trocr "$CKPT" \
  > $Q/verify_rect.log 2>&1
tail -3 $Q/verify_rect.log
grep -q "VERIFY PASS" $Q/verify_rect.log || { echo "VERIFY FAILED"; exit 1; }

echo "== 3. benches =="
for c in 3 5 4 1 2; do
  timeout 1500 python bench.py --config $c 2>$Q/r4bench$c.err \
    | tail -1 | tee $Q/r4bench$c.json
done
timeout 1500 python bench.py --device-resident 2>$Q/r4benchdr.err \
  | tail -1 | tee $Q/r4benchdr.json
echo "QUEUE DONE"
