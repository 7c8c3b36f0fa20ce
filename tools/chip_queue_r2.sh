#!/bin/bash
# Sequential chip-job queue for round 2 (VERDICT items 4/6/7).
# Short, guaranteed-recordable jobs first; the long ListOps budgets last
# (they checkpoint every 4800 steps and resume with --resume).
# One process at a time: the axon tunnel serves a single client.
set -u
cd /root/repo
mkdir -p logs

echo "[queue] wikitext-mamba2 slice  $(date +%T)"
timeout 3600 python -u launch.py --config configs/wikitext-mamba2-short.yaml \
  --analysis_config configs/analysis/wikitext.yaml \
  > logs/wikitext-mamba2-short.log 2>&1
echo "[queue] rc=$?"

echo "[queue] wikitext norm-attention seeds x lrs sweep  $(date +%T)"
timeout 7200 python -u launch.py --config configs/sweep/wikitext-norm-attention-seeds-lrs.yaml \
  --analysis_config configs/analysis/wikitext.yaml --sweep \
  > logs/wikitext-norm-attention-sweep.log 2>&1
echo "[queue] rc=$?"

echo "[queue] per-family analysis latency  $(date +%T)"
timeout 5400 python -u tools/bench_analysis.py > logs/bench_analysis.log 2>&1
echo "[queue] rc=$?"

echo "[queue] ssd profile  $(date +%T)"
timeout 1800 python -u tools/profile_ssd.py > logs/profile_ssd.log 2>&1
echo "[queue] rc=$?"

echo "[queue] listops-s4 full budget  $(date +%T)"
timeout 10800 python -u launch.py --config configs/tasks/listops/listops-s4.yaml \
  --analysis_config configs/analysis/listops.yaml --resume \
  > logs/listops-s4-full.log 2>&1
echo "[queue] rc=$?"

echo "[queue] listops-s5 full budget  $(date +%T)"
timeout 10800 python -u launch.py --config configs/tasks/listops/listops-s5.yaml \
  --analysis_config configs/analysis/listops.yaml --resume \
  > logs/listops-s5-full.log 2>&1
echo "[queue] rc=$?"

echo "[queue] done  $(date +%T)"
