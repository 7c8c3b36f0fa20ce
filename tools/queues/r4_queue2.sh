#!/bin/bash
# Round-4 chip queue 2: lr3e-3 80k norm-attention probe (cross-LR
# saturation evidence), mamba2 sparse roofline rerun (timed out in queue 1),
# lin-block per-op profile, then bench.py for the record.
set -u
cd /root/repo
mkdir -p logs
echo "=== norm-attention lr3e-3 80k ==="
timeout 3600 python launch.py --config configs/tasks/mqar/mqar-norm-attention-conv-lr3e-3-80k.yaml \
  --analysis_config configs/analysis/mqar.yaml > logs/norm3e3_80k.out 2>&1
tail -3 logs/norm3e3_80k.out | grep -v WARNING
echo "=== mamba2 sparse roofline ==="
timeout 3600 python tools/profile_mqar_roofline.py mamba2 100 2 8192 2>&1 | grep -v WARNING | tail -3
echo "=== lin block per-op profile ==="
timeout 3600 python tools/profile_lin_block_ops.py 2>&1 | grep -v WARNING | tail -3
echo "=== bench.py ==="
timeout 3600 python bench.py > logs/bench_r4.out 2>&1
tail -2 logs/bench_r4.out | grep -v WARNING
echo "=== queue2 done ==="
