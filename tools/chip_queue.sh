#!/bin/bash
# Sequential chip-job queue for round 2: waits for the live listops-s4 run,
# then drives the remaining VERDICT item-4/6/7 workloads one at a time
# (the axon tunnel serves one process; see .claude/skills/verify/SKILL.md).
set -u
cd /root/repo

wait_for() {  # wait_for <pattern> — block until no live process matches
  while pgrep -f "$1" > /dev/null; do sleep 60; done
}

echo "[queue] waiting for listops-s4"
wait_for "listops-s4.yaml"

echo "[queue] listops-s5"
python -u launch.py --config configs/tasks/listops/listops-s5.yaml \
  --analysis_config configs/analysis/listops.yaml --resume \
  > logs/listops-s5-full.log 2>&1

echo "[queue] wikitext-mamba2 slice"
python -u launch.py --config configs/wikitext-mamba2-short.yaml \
  --analysis_config configs/analysis/wikitext.yaml \
  > logs/wikitext-mamba2-short.log 2>&1

echo "[queue] wikitext norm-attention seeds x lrs sweep"
python -u launch.py --config configs/sweep/wikitext-norm-attention-seeds-lrs.yaml \
  --analysis_config configs/analysis/wikitext.yaml --sweep \
  > logs/wikitext-norm-attention-sweep.log 2>&1

echo "[queue] per-family analysis latency"
python -u tools/bench_analysis.py > logs/bench_analysis.log 2>&1

echo "[queue] ssd profile"
python -u tools/profile_ssd.py > logs/profile_ssd.log 2>&1

echo "[queue] done"
