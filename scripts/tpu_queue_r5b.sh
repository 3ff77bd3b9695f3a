#!/bin/bash
# Round-5 queue B (chained after r5a): the measurement items that need
# code landed this round — the FULL-tail fold A/B (VERDICT r4 #4), the
# x8 flagships (#6), the SRGAN procedural long-horizon + eval-mode-D
# spot check (#9), and the x2/x3 SSIM backfill (#8, device SSIM now
# carries the Precision.HIGHEST fix).
# Usage: tpu_queue_r5b.sh [wait_pid] [stages...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r5

wait_pid=${1:-}
if [ -n "$wait_pid" ]; then
  echo "waiting for pid $wait_pid (current queue) ..."
  while kill -0 "$wait_pid" 2>/dev/null; do sleep 60; done
fi

run() { # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name ==="
  timeout "$t" "$@" > "/root/r5/$name.log" 2>&1
  echo "--- rc=$? tail:"; tail -3 "/root/r5/$name.log"
}

stages=("${@:2}")
[ ${#stages[@]} -eq 0 ] && stages=(
  fold_full srgan_evalmodeD x8_flagship srgan_flagship x2zoo x3zoo)
for stage in "${stages[@]}"; do
case $stage in
# FULL-tail fold A/B (normal vs 'last' vs 'full') — method of record
fold_full)
  run fold_full 3600 python scripts/bench_preshuffle.py 100 EDSR ESPCN ;;
# sampler share after the gather-augment rewrite (one D4 gather instead
# of all-4-rotations-under-vmap) — same A/B as results_sampler_matrix_ab
augment_ab)
  run augment_ab_espcn 2400 python scripts/bench_train.py ESPCN 100
  run augment_ab_edsr 2400 python scripts/bench_train.py EDSR 100 ;;
# eval-mode-D vs train-mode-D on the PROCEDURAL benchmark (PARITY
# delta 10's evidence was only on the retired saturated set); compare
# against the rgb3ch SRGAN row (same recipe, eval-mode default)
srgan_evalmodeD)
  run srgan_evalmodeD 7200 python scripts/train_zoo.py --steps 20000 \
    --spd 100 --models SRGAN --adv_d_train_mode \
    --train_dataset procedural --test_dataset procedural \
    --out results_srgan_trainmodeD_procedural.json ;;
# x8 flagship-scale rows (LapSRN's signature regime + EDSR (2,2,2)):
# 100k steps (VERDICT #6 names 100-150k; 100k keeps the x2/x3 SSIM
# backfill inside the round's wall clock), crop 128, + int8 ladder
x8_flagship)
  run x8_flagship 14400 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --scale_factor 8 --crop 128 --models LapSRN EDSR \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/x8_flagship_{model}.npz' \
    --out results_x8_flagship.json ;;
# SRGAN three-term long-horizon on the procedural benchmark under RGB
# (needs the synthetic VGG tower; weights file created by the queue)
srgan_flagship)
  python scripts/make_synthetic_vgg.py /root/r5/vgg19_synthetic.pth \
    > /root/r5/make_vgg.log 2>&1
  run srgan_flagship 14400 python scripts/train_zoo.py --steps 150000 \
    --spd 100 --models SRGAN --vgg /root/r5/vgg19_synthetic.pth \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/srgan_flagship_{model}.npz' \
    --out results_srgan_flagship_procedural.json ;;
# x2 / x3 procedural zoos re-run: PSNR re-validated at HEAD and the
# SSIM columns backfilled with the fixed device-SSIM path
x2zoo)
  run x2zoo 14400 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 2 \
    --train_dataset procedural --test_dataset procedural \
    --out results_zoo_procedural_x2_r5.json ;;
x3zoo)
  run x3zoo 10800 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 3 \
    --train_dataset procedural --test_dataset procedural \
    --out results_zoo_procedural_x3_r5.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5b done ==="
