#!/bin/bash
# Round-5 queue F — final chip stages after the D4-gather revert
# (r5e script retired; its x3zoo child kept and waited on here).
#   augment_rerun — confirm the revert restores the matrix-sampler
#                   training rates (the shipped default; feeds BENCH)
#   fold_full     — retry of the full-tail fold A/B (VERDICT r4 #4):
#                   the 10:08 attempt died waiting on a wedged remote
#                   compile left by a killed client
#   srgan_evalmodeD — PARITY delta 10 A/B on the procedural set (#9)
# Usage: tpu_queue_r5f.sh [wait_pid] [stages...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r5

DEADLINE=1787225100  # ~11:25 UTC — leave the chip free for bench.py

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  echo "waiting for pid $wait_pid (current queue) ..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 30; done
fi

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  if [ "$(date +%s)" -gt "$DEADLINE" ]; then
    echo "=== deadline passed — skipping $name ==="; return
  fi
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$t" "$@" > "/root/r5/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/root/r5/$name.log"
}

stages=("${@:2}")
[ ${#stages[@]} -eq 0 ] && stages=(augment_rerun fold_full srgan_evalmodeD)
for stage in "${stages[@]}"; do
case $stage in
augment_rerun)
  run augment_rerun_espcn 900 python scripts/bench_train.py ESPCN 100
  run augment_rerun_edsr 900 python scripts/bench_train.py EDSR 100 ;;
fold_full)
  run fold_full_retry 1500 python scripts/bench_preshuffle.py 100 EDSR ESPCN ;;
srgan_evalmodeD)
  run srgan_evalmodeD 1500 python scripts/train_zoo.py --steps 20000 \
    --spd 100 --models SRGAN --adv_d_train_mode \
    --train_dataset procedural --test_dataset procedural \
    --out results_srgan_trainmodeD_procedural.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5f done ==="
