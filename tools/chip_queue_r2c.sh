#!/bin/bash
# Round-2 third chip queue: waits for queue r2b, then re-measures the
# analysis-latency north star after the eval_eig jit overhaul (the slow
# rows: listops s4/s5, wikitext mamba2/norm-attention, plus mqar for the
# headline table).
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2b.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2b.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-c] bench_analysis post-jit  $(date +%T)"
timeout 5400 python -u tools/bench_analysis.py > logs/bench_analysis_r2c.log 2>&1
echo "[queue-c] rc=$?"

echo "[queue-c] done  $(date +%T)"
