#!/bin/bash
# Round-5 queue A — re-measure everything round 4 left in the wiped
# /tmp/r4 (VERDICT r4 Missing #4: the RGB 3-channel re-baseline, the
# x8 procedural zoo, the deconv-int8 decision data, the matrix-sampler
# A/B, and the paper-width flagship raw JSON) — this time writing
# results INTO THE REPO and params/logs to persistent /root/r5.
# Usage: tpu_queue_r5a.sh [wait_pid] [stages...]
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
  bench_train_matrix_espcn bench_train_matrix_edsr deconv_int8
  rgb3ch lapsrn_x4 paper_train paper_plain paper_ens paper_int8s x8zoo)
for stage in "${stages[@]}"; do
case $stage in
# matrix-mode sampler A/B (VERDICT #3): item/batch/matrix steps/s
bench_train_matrix_espcn)
  run bench_train_matrix_espcn 2400 python scripts/bench_train.py ESPCN 100 ;;
bench_train_matrix_edsr)
  run bench_train_matrix_edsr 2400 python scripts/bench_train.py EDSR 100 ;;
# deconv-int8 routing data (VERDICT #5): FSRCNN/LapSRN exact vs
# int8-body vs int8-all
deconv_int8)
  run deconv_int8 2400 python scripts/bench_deconv_int8.py ;;
# RGB-convention re-baseline of the three 3-channel models (VERDICT #2)
rgb3ch)
  run rgb3ch 10800 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --models EDSR SRResNet SRGAN \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/rgb3ch_{model}.npz' \
    --out results_zoo_rgb3ch.json ;;
# LapSRN x4 procedural row SSIM backfill (VERDICT #8) — device SSIM is
# fixed (Precision.HIGHEST, jaxpr-locked)
lapsrn_x4)
  run lapsrn_x4 4800 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --models LapSRN \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/root/r5/lapsrn_x4_{model}.npz' \
    --out results_lapsrn_x4_rerun.json ;;
# paper-width EDSR 50k flagship, re-trained under the RGB convention
# (VERDICT #2 second half). Train-only: the in-process eval compile is
# the hang-prone part at this width; variants below eval from the .npz
paper_train)
  run paper_train 9000 python scripts/train_zoo.py --steps 50000 --spd 100 \
    --models EDSR --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/root/r5/edsr_paper_rgb_{model}.npz' --skip_eval \
    --out /root/r5/paper_train_meta.json ;;
paper_plain)
  run paper_plain 5400 python scripts/eval_saved.py \
    /root/r5/edsr_paper_rgb_EDSR.npz --model EDSR --variant plain \
    --test_dataset procedural --scale_factor 4 \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append results_edsr_paper_rgb.json ;;
paper_ens)
  run paper_ens 5400 python scripts/eval_saved.py \
    /root/r5/edsr_paper_rgb_EDSR.npz --model EDSR --variant ensemble \
    --test_dataset procedural --scale_factor 4 \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append results_edsr_paper_rgb.json ;;
paper_int8s)
  run paper_int8s 5400 python scripts/eval_saved.py \
    /root/r5/edsr_paper_rgb_EDSR.npz --model EDSR --variant int8_static \
    --test_dataset procedural --scale_factor 4 \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append results_edsr_paper_rgb.json ;;
# x8 procedural zoo (VERDICT #1/#6 precondition): the lost round-4 run
# showed all nine models beating bicubic at x8 — re-measure into repo
x8zoo)
  run x8zoo 14400 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 8 --crop 128 \
    --train_dataset procedural --test_dataset procedural \
    --out results_zoo_procedural_x8.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r5a done ==="
