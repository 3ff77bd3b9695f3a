#!/bin/bash
# Round-5 queue C — resume after the mid-round host restart killed
# queue r5a at x8zoo model 5/9 (LapSRN epoch 32) and r5b before it
# started. Stages, in verdict-priority order:
#   fold_full     — FULL-tail fold A/B (VERDICT r4 #4; feeds BENCH r5)
#   x8zoo_rest    — the five x8 zoo models the restart killed, merged
#                   into results_zoo_procedural_x8.json (#6 precondition)
#   x2zoo / x3zoo — SSIM backfill re-runs at HEAD (#8)
#   srgan_evalmodeD — PARITY delta 10 A/B on the procedural set (#9)
#   x8_flagship   — 100k LapSRN+EDSR x8 rows (#6)
#   srgan_flagship — 150k three-term long-horizon (#9)
# Usage: tpu_queue_r5c.sh [wait_pid] [stages...]
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
  fold_full x8zoo_rest x2zoo x3zoo srgan_evalmodeD x8_flagship
  srgan_flagship)
for stage in "${stages[@]}"; do
case $stage in
fold_full)
  run fold_full 3600 python scripts/bench_preshuffle.py 100 EDSR ESPCN ;;
x8zoo_rest)
  run x8zoo_rest 14400 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 8 --crop 128 \
    --models lapsrn srcnn srgan srresnet vdsr \
    --train_dataset procedural --test_dataset procedural \
    --out results_zoo_procedural_x8_rest.json
  python - <<'EOF'
import json
a = json.load(open("results_zoo_procedural_x8.json"))
b = json.load(open("results_zoo_procedural_x8_rest.json"))
have = {r.get("model") for r in a}
a += [r for r in b if r.get("model") not in have]
json.dump(a, open("results_zoo_procedural_x8.json", "w"), indent=1)
print("merged ->", [r.get("model") for r in a])
EOF
  ;;
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
srgan_evalmodeD)
  run srgan_evalmodeD 7200 python scripts/train_zoo.py --steps 20000 \
    --spd 100 --models SRGAN --adv_d_train_mode \
    --train_dataset procedural --test_dataset procedural \
    --out results_srgan_trainmodeD_procedural.json ;;
x8_flagship)
  run x8_flagship 14400 python scripts/train_zoo.py --steps 100000 \
    --spd 100 --scale_factor 8 --crop 128 --models LapSRN EDSR \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/x8_flagship_{model}.npz' \
    --out results_x8_flagship.json ;;
srgan_flagship)
  python scripts/make_synthetic_vgg.py /root/r5/vgg19_synthetic.pth \
    > /root/r5/make_vgg.log 2>&1
  run srgan_flagship 14400 python scripts/train_zoo.py --steps 150000 \
    --spd 100 --models SRGAN --vgg /root/r5/vgg19_synthetic.pth \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/srgan_flagship_{model}.npz' \
    --out results_srgan_flagship_procedural.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5c done ==="
