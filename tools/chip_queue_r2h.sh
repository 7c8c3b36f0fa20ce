#!/bin/bash
# Round-2 queue h: CIFAR task x family breadth — truncated 2-epoch budgets
# with full eigen-analysis for the families that had no CIFAR chip evidence
# (only cifar-s4 had a full run).
set -u
cd /root/repo
mkdir -p logs

for fam in s5 lru mamba2 norm-attention-conv; do
  echo "[queue-h] cifar-$fam  $(date +%T)"
  timeout 3600 python -u tools/run_truncated.py \
    --config configs/tasks/cifar/cifar-$fam.yaml \
    --epochs 2 --analysis_batch 64 \
    > logs/cifar-$fam-short.log 2>&1
  echo "[queue-h] cifar-$fam rc=$?"
done
echo "[queue-h] done  $(date +%T)"
