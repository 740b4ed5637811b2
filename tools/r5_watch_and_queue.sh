#!/bin/bash
# Round-5 relay watcher: poll the TPU relay; the moment it answers,
# run the r5 queue (tools/r5_tpu_queue.sh) exactly once.
# Run under tmux: tmux new-session -d -s r5q 'bash tools/r5_watch_and_queue.sh'
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r5q
LOG=/tmp/r5q/watch.log
echo "$(date -u +%FT%TZ) watcher started" | tee -a "$LOG"
while true; do
  if timeout 150 python -c "
from vtd_tpu.core.tpu_preflight import bounded_device_count
import sys; sys.exit(0 if bounded_device_count() > 0 else 1)
" >/dev/null 2>&1; then
    echo "$(date -u +%FT%TZ) relay UP; launching queue" | tee -a "$LOG"
    bash tools/r5_tpu_queue.sh 2>&1 | tee -a /tmp/r5q/queue.log
    rc=$?
    echo "$(date -u +%FT%TZ) queue finished rc=$rc" | tee -a "$LOG"
    break
  fi
  echo "$(date -u +%FT%TZ) relay down; retry in 180s" >> "$LOG"
  sleep 180
done
