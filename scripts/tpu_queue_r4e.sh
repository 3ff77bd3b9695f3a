#!/bin/bash
# Round-4 session-6 follow-up queue: re-baseline the three 3-channel
# models under the FIXED color convention (train_zoo now loads
# procedural in RGB for 3-channel models, matching sr.main / SURVEY
# §2.2 — round-4 review finding; the recorded x4 rows trained on YCbCr
# planes). Quantifies the convention delta for RESULTS.md.
# Usage: tpu_queue_r4e.sh [wait_pid] [stages...]
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

stages=("${@:2}")
[ ${#stages[@]} -eq 0 ] && stages=(paper_plain paper_ens paper_int8s rgb3ch bench_final)
for stage in "${stages[@]}"; do
case $stage in
# paper-width EDSR eval, one variant per process (the in-process eval
# hung the relay twice at this width; weights survived via
# --save_params). --color ycbcr: these weights pre-date the RGB fix.
paper_plain)
  run paper_plain 5400 python scripts/eval_saved.py \
    /tmp/r4/edsr_paper_EDSR.npz --model EDSR --variant plain \
    --test_dataset procedural --scale_factor 4 --color ycbcr \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append /tmp/r4/results_edsr_paper_long.json ;;
paper_ens)
  run paper_ens 5400 python scripts/eval_saved.py \
    /tmp/r4/edsr_paper_EDSR.npz --model EDSR --variant ensemble \
    --test_dataset procedural --scale_factor 4 --color ycbcr \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append /tmp/r4/results_edsr_paper_long.json ;;
paper_int8s)
  run paper_int8s 5400 python scripts/eval_saved.py \
    /tmp/r4/edsr_paper_EDSR.npz --model EDSR --variant int8_static \
    --test_dataset procedural --scale_factor 4 --color ycbcr \
    --base_filter 256 --num_resblocks 32 --res_scale 0.1 \
    --append /tmp/r4/results_edsr_paper_long.json ;;
rgb3ch)
  run rgb3ch 10800 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --models EDSR SRResNet SRGAN \
    --train_dataset procedural --test_dataset procedural \
    --ensemble_eval --quant_eval \
    --save_params '/tmp/r4/rgb3ch_{model}.npz' \
    --out /tmp/r4/results_zoo_rgb3ch.json ;;
bench_final)
  run bench_final 3600 python bench.py ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue r4e done ==="
