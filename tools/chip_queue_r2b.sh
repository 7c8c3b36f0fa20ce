#!/bin/bash
# Round-2 follow-up chip queue: waits for the ListOps chain (PID in
# /tmp/listops.pid) to exit, then completes the remaining task-family
# evidence. One process at a time: the axon tunnel serves a single client.
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/listops.pid ]; then
  while kill -0 "$(cat /tmp/listops.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-b] mqar norm-attention full budget  $(date +%T)"
timeout 5400 python -u launch.py --config configs/tasks/mqar/mqar-norm-attention-conv.yaml \
  --analysis_config configs/analysis/mqar.yaml \
  > logs/mqar-norm-attention-full.log 2>&1
echo "[queue-b] rc=$?"

echo "[queue-b] imdb lru full budget  $(date +%T)"
timeout 7200 python -u launch.py --config configs/tasks/imdb/imdb-lru.yaml \
  --analysis_config configs/analysis/imdb.yaml --resume \
  > logs/imdb-lru-full.log 2>&1
echo "[queue-b] rc=$?"

echo "[queue-b] bench sanity  $(date +%T)"
timeout 3600 python -u bench.py > logs/bench_r2b.log 2>&1
echo "[queue-b] rc=$?"

echo "[queue-b] done  $(date +%T)"
