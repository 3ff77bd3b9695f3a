#!/bin/bash
# Round-4 session-6 TPU queue: (1) the pre-shuffle training-loss A/B
# (the only open question from commit b8673c7), (2) re-run the
# paper-width EDSR 50k flagship WITH --save_params (the r4c run lost
# its weights when the paper-width eval compile hung the relay —
# CLAUDE.md "killed clients leave the remote compile server wedged"),
# (3) re-run the lost x8 procedural zoo row. One job at a time.
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
[ ${#stages[@]} -eq 0 ] && stages=(preshuffle edsr_paper_long2 zoo_x8b)
for stage in "${stages[@]}"; do
case $stage in
preshuffle)
  run preshuffle 3600 python scripts/bench_preshuffle.py 100 ESPCN EDSR ;;
edsr_paper_long2)
  # params are persisted BEFORE eval (train_zoo.py order), so a hung
  # paper-width eval compile no longer costs the training run
  run edsr_paper_long2 14400 python scripts/train_zoo.py --steps 50000 \
    --spd 100 --models EDSR --train_dataset procedural \
    --test_dataset procedural --base_filter 256 --num_resblocks 32 \
    --res_scale 0.1 --ensemble_eval --quant_eval \
    --save_params '/tmp/r4/edsr_paper_{model}.npz' \
    --out /tmp/r4/results_edsr_paper_long.json ;;
zoo_x8b)
  run zoo_x8b 18000 python scripts/train_zoo.py --steps 20000 --spd 100 \
    --scale_factor 8 --crop 128 \
    --train_dataset procedural --test_dataset procedural \
    --save_params '/tmp/r4/zoo_x8_{model}.npz' \
    --out /tmp/r4/results_zoo_procedural_x8.json ;;
*) echo "unknown stage $stage" ;;
esac
done
echo "=== queue done ==="
