#!/usr/bin/env bash
# Generic sequential chip-run queue (replaces the round-2 one-shot scripts).
#
# Usage: tools/chip_queue.sh QUEUE_FILE
#   QUEUE_FILE: one shell command per line (comments/# and blanks skipped).
#
# Runs each command sequentially — the axon tunnel serves ONE process — and
# logs to logs/queue_<n>.out. A failing command is logged and the queue
# continues.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs
n=0
while IFS= read -r cmd; do
  case "$cmd" in ''|\#*) continue;; esac
  n=$((n + 1))
  log="logs/queue_${n}.out"
  echo "[queue] ($n) $cmd -> $log"
  if ! bash -c "$cmd" > "$log" 2>&1; then
    echo "[queue] ($n) FAILED (see $log)"
  fi
done < "$1"
echo "[queue] done ($n commands)"
