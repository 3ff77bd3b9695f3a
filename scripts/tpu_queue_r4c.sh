#!/bin/bash
# Round-4 follow-up TPU queue: complete the procedural re-baseline's
# scale coverage (x3, x8 — x4 and x2 run in tpu_queue_r4.sh). Same
# one-job-at-a-time rule as tpu_queue_r4.sh.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/r4

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$t" "$@" > "/tmp/r4/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/tmp/r4/$name.log"
}

stages=("$@")
[ ${#stages[@]} -eq 0 ] && stages=(lapsrn20k zoo_x3 zoo_x8 edsr_paper_long)
for stage in "${stages[@]}"; do
case $stage in
lapsrn20k)
  # retry: the zoo20k lapsrn row died on a remote-compile relay flake
  run lapsrn20k 7200 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --models lapsrn --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --out /tmp/r4/results_lapsrn_20k.json ;;
edsr_paper_long)
  # flagship quality headline at paper width: EDSR 32 blocks / 256
  # filters / res_scale 0.1 (Lim et al. CVPRW'17 config), 50k steps on
  # the procedural corpus with ensemble + int8 eval columns
  run edsr_paper_long 14400 python scripts/train_zoo.py --steps 50000 \
    --spd 100 --models EDSR --train_dataset procedural \
    --test_dataset procedural --base_filter 256 --num_resblocks 32 \
    --res_scale 0.1 --ensemble_eval --quant_eval \
    --out /tmp/r4/results_edsr_paper_long.json ;;
zoo_x3)
  run zoo_x3 18000 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 3 --train_dataset procedural --test_dataset procedural \
    --out /tmp/r4/results_zoo_procedural_x3.json ;;
zoo_x8)
  # crop 128 so the LR crop keeps context at x8 (RESULTS r3 finding)
  run zoo_x8 18000 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 8 --crop 128 \
    --train_dataset procedural --test_dataset procedural \
    --out /tmp/r4/results_zoo_procedural_x8.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue done ==="
