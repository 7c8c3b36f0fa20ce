#!/bin/bash
# Round-4 chip queue: waits for the current chip run (pid file) to exit,
# then runs the MQAR roofline ablations (VERDICT r3 item 4) with the new
# sparse decoder head A/B, the WikiText restore-latency bench (item 7),
# and bench.py. One process at a time — the tunnel serves one process.
set -u
PIDFILE=${1:-/tmp/norm80k.pid}
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat "$PIDFILE")" 2>/dev/null; do sleep 20; done
fi
cd /root/repo
mkdir -p logs
run() { echo "=== $* ==="; timeout 1800 "$@" 2>&1 | grep -v WARNING | tail -4; }

# headline lin-attention: sparse (production) vs dense (old protocol check)
run python tools/profile_mqar_roofline.py lin 100 2 8192
run env TLIE_SPARSE_HEAD=0 python tools/profile_mqar_roofline.py lin 100 2 8192
# layer slope + vocab + dispatch ablations under the sparse head
run python tools/profile_mqar_roofline.py lin 100 1 8192
run python tools/profile_mqar_roofline.py lin 100 4 8192
run python tools/profile_mqar_roofline.py lin 100 2 512
run python tools/profile_mqar_roofline.py lin 25 2 8192
# mamba2 with the sparse head (dense 65.40 recorded in RESULTS round 4)
run python tools/profile_mqar_roofline.py mamba2 100 2 8192
# standalone-restore analysis latency at LM shapes (params-only restore)
run python tools/bench_analysis.py wikitext-103
echo "=== queue done ==="
