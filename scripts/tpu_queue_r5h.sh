#!/bin/bash
# Round-5 queue H — overtime completions after r5g:
#   lapsrn_x8_int8 — the one empty cell in the x8 flagship table
#   srresnet_x8    — SRResNet led the 20k x8 zoo (25.26); at the 100k
#                    flagship horizon it may take the x8 crown
# Usage: tpu_queue_r5h.sh [wait_pid] [stages...]
set -u
cd "$(dirname "$0")/.."
mkdir -p /root/r5

DEADLINE=${DEADLINE:-1787252400}

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
[ ${#stages[@]} -eq 0 ] && stages=(lapsrn_x8_int8 srresnet_x8)
for stage in "${stages[@]}"; do
case $stage in
lapsrn_x8_int8)
  run lapsrn_x8_int8 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_LapSRN.npz --model LapSRN --variant int8_static \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json ;;
srresnet_x8)
  run srresnet_x8_train 7200 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --scale_factor 8 --crop 128 --models SRResNet \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/x8_flagship_{model}.npz' --skip_eval \
    --out /root/r5/x8_srresnet_meta.json
  run srresnet_x8_plain 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_SRResNet.npz --model SRResNet --variant plain \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json
  run srresnet_x8_ens 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_SRResNet.npz --model SRResNet --variant ensemble \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json
  run srresnet_x8_int8s 3600 python scripts/eval_saved.py \
    /root/r5/x8_flagship_SRResNet.npz --model SRResNet --variant int8_static \
    --test_dataset procedural --scale_factor 8 \
    --append results_x8_flagship.json ;;
srgan_150k)
  # round-3's 150k-stability horizon, reproduced on the procedural
  # corpus (the 100k r5g run showed G stable through D saturation;
  # this extends the evidence to the original claim's horizon)
  run srgan_150k_train 10800 python scripts/train_zoo.py --steps 150000 \
    --spd 100 --models SRGAN --vgg /root/r5/vgg19_synthetic.pth \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/srgan_150k_{model}.npz' --skip_eval \
    --out /root/r5/srgan_150k_meta.json
  run srgan_150k_plain 3600 python scripts/eval_saved.py \
    /root/r5/srgan_150k_SRGAN.npz --model SRGAN --variant plain \
    --test_dataset procedural --scale_factor 4 \
    --append results_srgan_flagship_procedural.json
  run srgan_150k_ens 3600 python scripts/eval_saved.py \
    /root/r5/srgan_150k_SRGAN.npz --model SRGAN --variant ensemble \
    --test_dataset procedural --scale_factor 4 \
    --append results_srgan_flagship_procedural.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5h done ==="
