#!/bin/bash
# Round-4 TPU work queue — ONE job at a time (relay: concurrent TPU
# processes corrupt timing and can wedge compiles). Each job is bounded;
# a hung compile dies with its timeout and the queue moves on.
# Usage: bash scripts/tpu_queue_r4.sh [stage...]   (default: all)
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
[ ${#stages[@]} -eq 0 ] && stages=(edsr150k zoo20k deconv paperscale bench profile_train zoo_x2)
for stage in "${stages[@]}"; do
case $stage in
edsr150k)
  run edsr150k 7200 python scripts/train_zoo.py --steps 150000 --spd 100 \
    --models EDSR --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --out /tmp/r4/results_edsr_150k.json ;;
zoo20k)
  run zoo20k 18000 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --out /tmp/r4/results_zoo_procedural_20k.json ;;
profile_train)
  run profile_train 3600 python scripts/profile_train.py EDSR 20 25 ;;
zoo_x2)
  run zoo_x2 18000 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 2 --train_dataset procedural --test_dataset procedural \
    --out /tmp/r4/results_zoo_procedural_x2.json ;;
deconv)
  run deconv 3600 python scripts/bench_deconv_int8.py ;;
paperscale)
  run drcn256 7200 python scripts/train_zoo.py --steps 5000 --spd 50 \
    --models DRCN --train_dataset procedural --test_dataset procedural \
    --base_filter 256 --out /tmp/r4/results_drcn256.json
  run edsr_paper 7200 python scripts/train_zoo.py --steps 5000 --spd 50 \
    --models EDSR --train_dataset procedural --test_dataset procedural \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --out /tmp/r4/results_edsr_paper.json
  # the recipe claim: res_scale 1.0 at paper width should be unstable
  run edsr_paper_rs1 7200 python scripts/train_zoo.py --steps 5000 --spd 50 \
    --models EDSR --train_dataset procedural --test_dataset procedural \
    --base_filter 256 --num_resblocks 32 --res_scale 1.0 \
    --out /tmp/r4/results_edsr_paper_rs1.json ;;
bench)
  run bench 3600 python bench.py ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue done ==="
