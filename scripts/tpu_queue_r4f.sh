#!/bin/bash
# Round-4 follow-up queue: measure the new 'matrix' random-scale mode
# against 'item'/'batch' on the real chip (scan-fused K-step method of
# record, scripts/bench_train.py), after the r4e queue finishes.
# Usage: tpu_queue_r4f.sh [wait_pid]
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  echo "waiting for pid $wait_pid (current queue) ..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 60; done
fi

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$t" "$@" > "/tmp/r4/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r4/$name.log"
}

run bench_train_matrix_espcn 3600 python scripts/bench_train.py ESPCN 100
run bench_train_matrix_edsr 3600 python scripts/bench_train.py EDSR 100
echo "=== queue r4f done ==="
