#!/bin/bash
# Round-2 queue i: PathFinder truncated chip run (waits for queue r2h).
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2h.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2h.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-i] pathfinder-s4  $(date +%T)"
timeout 3600 python -u tools/run_truncated.py \
  --config configs/tasks/pathfinder/pathfinder-s4.yaml \
  --epochs 2 --analysis_batch 64 \
  > logs/pathfinder-s4-short.log 2>&1
echo "[queue-i] pathfinder-s4 rc=$?"
echo "[queue-i] done  $(date +%T)"
