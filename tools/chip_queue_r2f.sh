#!/bin/bash
# Round-2 final chip queue: waits for queue r2e, then runs the fixed
# bench.py (the r2b attempt OOMed on a 64-wide init at WikiText shapes).
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2e.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2e.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-f] bench final  $(date +%T)"
timeout 3600 python -u bench.py > logs/bench_r2f.log 2>&1
echo "[queue-f] rc=$?"

echo "[queue-f] done  $(date +%T)"
