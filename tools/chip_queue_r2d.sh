#!/bin/bash
# Round-2 fourth chip queue: waits for queue r2c, then measures the bf16
# fused-CE head at WikiText shapes (vs the 25.6 steps/s XLA bf16 path).
set -u
cd /root/repo
mkdir -p logs

if [ -f /tmp/queue_r2c.pid ]; then
  while kill -0 "$(cat /tmp/queue_r2c.pid)" 2>/dev/null; do sleep 60; done
fi

echo "[queue-d] wikitext mamba2 bf16 + fused head  $(date +%T)"
timeout 3600 python -u launch.py --config configs/wikitext-mamba2-short-bf16-fused.yaml \
  > logs/wikitext-mamba2-bf16-fused.log 2>&1
echo "[queue-d] rc=$?"

echo "[queue-d] done  $(date +%T)"
