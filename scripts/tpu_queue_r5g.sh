#!/bin/bash
# Round-5 queue G — overtime stages (the round ran past its nominal 10h;
# resume the deferred next-round candidates in priority order):
#   drcn_x3         — DRCN x3 20k re-run: the one SSIM cell still
#                     unfilled after the device-SSIM backfill (#8)
#   srgan_evalmodeD — PARITY delta 10 A/B arm on the procedural set,
#                     the r5f stage that died waiting on the old queue
#   edsr_x8_100k    — x8 flagship, EDSR (2,2,2 tail), 100k crop128;
#                     train-only + eval_saved variants (hang insurance)
#   srgan_100k      — SRGAN three-term (synthetic VGG) 100k RGB
#                     procedural long-horizon (VERDICT r4 #9)
#   lapsrn_x8_100k  — LapSRN x8 100k (its paper's signature regime);
#                     longest (~4.6h at the 20k rate) so it runs last
# Usage: tpu_queue_r5g.sh [wait_pid] [stages...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r5

DEADLINE=${DEADLINE:-1787252400}  # ~19:00 UTC fallback guard

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
[ ${#stages[@]} -eq 0 ] && stages=(
  drcn_x3 srgan_evalmodeD edsr_x8_100k srgan_100k lapsrn_x8_100k)
for stage in "${stages[@]}"; do
case $stage in
drcn_x3)
  run drcn_x3 3600 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --models DRCN --scale_factor 3 \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/drcn_x3_{model}.npz' \
    --out results_drcn_x3_r5.json ;;
srgan_evalmodeD)
  run srgan_evalmodeD 3600 python scripts/train_zoo.py --steps 20000 \
    --spd 100 --models SRGAN --adv_d_train_mode \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/srgan_trainmodeD_{model}.npz' \
    --out results_srgan_trainmodeD_procedural.json ;;
edsr_x8_100k)
  run edsr_x8_train 7200 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --scale_factor 8 --crop 128 --models EDSR \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/x8_flagship_{model}.npz' --skip_eval \
    --out /root/r5/x8_edsr_meta.json
  run edsr_x8_plain 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_EDSR.npz --model EDSR --variant plain \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json
  run edsr_x8_ens 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_EDSR.npz --model EDSR --variant ensemble \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json
  run edsr_x8_int8s 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_EDSR.npz --model EDSR --variant int8_static \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json ;;
srgan_100k)
  [ -f /root/r5/vgg19_synthetic.pth ] || \
    python scripts/make_synthetic_vgg.py /root/r5/vgg19_synthetic.pth \
      > /root/r5/make_vgg.log 2>&1
  run srgan_100k_train 10800 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --models SRGAN --vgg /root/r5/vgg19_synthetic.pth \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/srgan_100k_{model}.npz' --skip_eval \
    --out /root/r5/srgan_100k_meta.json
  run srgan_100k_plain 3600 python scripts/eval_saved.py \
    /root/r5/srgan_100k_SRGAN.npz --model SRGAN --variant plain \
    --test_dataset procedural --scale_factor 4 \
    --append results_srgan_flagship_procedural.json
  run srgan_100k_ens 3600 python scripts/eval_saved.py \
    /root/r5/srgan_100k_SRGAN.npz --model SRGAN --variant ensemble \
    --test_dataset procedural --scale_factor 4 \
    --append results_srgan_flagship_procedural.json ;;
lapsrn_x8_100k)
  run lapsrn_x8_train 19800 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --scale_factor 8 --crop 128 --models LapSRN \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/x8_flagship_{model}.npz' --skip_eval \
    --out /root/r5/x8_lapsrn_meta.json
  run lapsrn_x8_plain 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_LapSRN.npz --model LapSRN --variant plain \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json
  run lapsrn_x8_ens 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_LapSRN.npz --model LapSRN --variant ensemble \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5g done ==="
