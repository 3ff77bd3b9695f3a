#!/bin/bash
# Round-3 session-2 TPU work queue: run serially the moment the relay
# recovers (each step logs to /tmp/q_*.log; killable via /tmp/q.pid).
# Steps ordered by decision value; every step survives a flaky/hung
# compile by the per-script retry logic or the outer timeout here.
set -u
cd /root/repo
echo $$ > /tmp/q.pid
# `kill $(cat /tmp/q.pid)` must also stop the in-flight python step,
# or a newly started TPU job would run concurrently with it
trap 'kill $(jobs -p) 2>/dev/null; exit 130' TERM INT
log() { echo "[queue $(date +%H:%M:%S)] $*"; }
run_step() { "$@" & wait $!; }

log "0. health probe"
run_step timeout 120 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float(jnp.sum(jnp.ones((64,64)) @ jnp.ones((64,64)))))" \
  || { log "TPU not healthy; aborting"; exit 1; }

log "1. fused-pair e2e (the decisive int8-static-fused measurement)"
run_step timeout 1500 python scripts/bench_quant_e2e.py EDSR 128 16 30 \
  bf16_fused,int8_static_fused >/tmp/q_fusedpair.log 2>&1
log "   rc=$? (log /tmp/q_fusedpair.log)"

log "2. per-op profile of the quant-fused program"
run_step timeout 900 python scripts/profile_ops.py EDSR quant_fused 16 \
  >/tmp/q_prof.log 2>&1
log "   rc=$?"

log "3. bench.py full (int8 headline candidate on real chip)"
run_step timeout 2400 python bench.py >/tmp/q_bench.log 2>&1
log "   rc=$?"

log "4. zoo 20k with static+dynamic int8 quality columns"
run_step timeout 7200 python scripts/train_zoo.py --steps 20000 --spd 100 \
  --quant_eval --out results_zoo_r3b.json >/tmp/q_zoo.log 2>&1
log "   rc=$?"

log "5. serve-latency attribution incl. quant_fused"
run_step timeout 1800 python scripts/bench_serve_latency.py 1 128 \
  >/tmp/q_lat.log 2>&1
log "   rc=$?"

log "6. Pallas int8 im2col conv: Mosaic gate + A/B vs XLA int8 conv"
run_step timeout 1500 python scripts/bench_pallas_int8.py 16 128 64 100 \
  >/tmp/q_pallas.log 2>&1
log "   rc=$?"

log "queue done"
