#!/bin/bash
# Round-5 queue E — final consolidated queue (r5d retired; r5c's queue
# script killed but its in-flight x2zoo child kept). Chained on the
# x2zoo PID. Deadline-guarded so nothing contends with the end-of-round
# bench.py run. Stages, in remaining-verdict priority:
#   fold_full  — clean full-tail fold A/B on the SLICE-BASED fold
#                construction (VERDICT r4 #4 verdict for PERF.md)
#   augment_ab — sampler share after the one-gather D4 rewrite
#   x3zoo      — x3 SSIM backfill + RGB EDSR row (VERDICT #8 / weak #2)
#   srgan_evalmodeD — PARITY delta 10 A/B on the procedural set (#9)
# Usage: tpu_queue_r5e.sh [wait_pid] [stages...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r5

DEADLINE=1787225100  # ~11:25 UTC — leave the chip free for bench.py

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  echo "waiting for pid $wait_pid (current queue) ..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 60; done
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
[ ${#stages[@]} -eq 0 ] && stages=(fold_full augment_ab x3zoo srgan_evalmodeD)
for stage in "${stages[@]}"; do
case $stage in
fold_full)
  run fold_full_clean 1800 python scripts/bench_preshuffle.py 100 EDSR ESPCN ;;
augment_ab)
  run augment_ab_espcn 900 python scripts/bench_train.py ESPCN 100
  run augment_ab_edsr 900 python scripts/bench_train.py EDSR 100 ;;
x3zoo)
  run x3zoo 3600 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 3 \
    --models EDSR DRCN ESPCN FSRCNN SRCNN VDSR \
    --train_dataset procedural --test_dataset procedural \
    --out results_zoo_procedural_x3_r5.json ;;
srgan_evalmodeD)
  run srgan_evalmodeD 1800 python scripts/train_zoo.py --steps 20000 \
    --spd 100 --models SRGAN --adv_d_train_mode \
    --train_dataset procedural --test_dataset procedural \
    --out results_srgan_trainmodeD_procedural.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5e done ==="
