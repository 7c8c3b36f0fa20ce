#!/bin/bash
# Round-2 queue g: warm-pass analysis-latency measurement (cold + warm per
# family) after the bench rerun.
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2f.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2f.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-g] bench_analysis cold+warm  $(date +%T)"
timeout 7200 python -u tools/bench_analysis.py > logs/bench_analysis_r2g.log 2>&1
echo "[queue-g] rc=$?"
echo "[queue-g] done  $(date +%T)"
