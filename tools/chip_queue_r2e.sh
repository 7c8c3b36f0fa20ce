#!/bin/bash
# Round-2 fifth chip queue: the reference's num_layers x LR Mamba-2 MQAR
# sweep grid (BASELINE "MQAR sweep grid" row) at a truncated 4k-step budget,
# run mesh-parallel with shape-group compilation (1-layer and 4-layer
# points vmap separately).
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2d.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2d.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-e] mqar mamba2 num_layers x lr sweep  $(date +%T)"
timeout 7200 python -u launch.py --config configs/sweep/mqar-mamba2-layers-short.yaml \
  --analysis_config configs/analysis/mqar.yaml --sweep --sweep_parallel \
  > logs/mqar-mamba2-layers-sweep.log 2>&1
echo "[queue-e] rc=$?"

echo "[queue-e] done  $(date +%T)"
