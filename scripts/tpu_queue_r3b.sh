#!/bin/bash
# Round-3 session-3 TPU follow-ups (serial; logs /tmp/q2_*.log).
set -u
cd /root/repo
echo $$ > /tmp/q2.pid
trap 'kill $(jobs -p) 2>/dev/null; exit 130' TERM INT
log() { echo "[q2 $(date +%H:%M:%S)] $*"; }
run_step() { "$@" & wait $!; }

log "0. health probe"
run_step timeout 120 python -c "
import jax, jax.numpy as jnp
print('tpu ok', float(jnp.sum(jnp.ones((64,64)) @ jnp.ones((64,64)))))" \
  || { log "TPU not healthy; aborting"; exit 1; }

log "1. per-channel static quality re-validation (4 worst models)"
run_step timeout 3600 python scripts/train_zoo.py --steps 20000 --spd 100 \
  --quant_eval --models edsr espcn fsrcnn lapsrn \
  --out results_zoo_r3c.json >/tmp/q2_zoo.log 2>&1
log "   rc=$?"

log "2. EDSR fused pair after per-channel change (perf regression gate)"
run_step timeout 1500 python scripts/bench_quant_e2e.py EDSR 128 16 30 \
  bf16_fused,int8_static_fused >/tmp/q2_edsr.log 2>&1
log "   rc=$?"

log "3. SRResNet folded composite A/B"
run_step timeout 1800 python scripts/bench_quant_e2e.py SRResNet 128 16 30 \
  bf16,bf16_folded,int8_static_folded >/tmp/q2_srresnet.log 2>&1
log "   rc=$?"

log "4. u8 output: device/fetch/marginal-linearity"
run_step timeout 1500 python scripts/bench_u8_out.py 128 16 30 \
  >/tmp/q2_u8.log 2>&1
log "   rc=$?"

log "5. Pallas int8 im2col at VMEM-fitting shape (throughput signal)"
run_step timeout 1500 python scripts/bench_pallas_int8.py 16 64 64 100 \
  >/tmp/q2_pallas.log 2>&1
log "   rc=$?"

log "q2 done"
