"""End-to-end quantized-forward throughput: bf16 vs int8 dynamic vs
int8 static (relay-robust chained scan).

The round-3 PERF finding was int8-dynamic ~0.89x bf16 despite the conv
itself running 1.48x faster in isolation (scripts/bench_int8_conv.py)
— the dynamic per-sample amax reduce costs ~2 extra HBM passes per
conv. Static calibrated scales (sr.quant mode="static") remove the
reduce; this script measures whether the MXU win now survives the full
model.

Usage: python scripts/bench_quant_e2e.py [MODEL] [LR] [BATCH] [K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from sr.models.registry import get_spec
from sr.quant import calibrate_scales, quantized_apply
from sr.utils.config import SRConfig


def main() -> None:
    model_name = sys.argv[1] if len(sys.argv) > 1 else "EDSR"
    lr = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    spec = get_spec(model_name)
    cfg = SRConfig(model_name=model_name, scale_factor=4,
                   num_channels=spec.default_channels, dtype="bfloat16")
    model = spec.make_model(cfg)
    c = cfg.num_channels
    in_hw = lr * cfg.scale_factor if spec.pre_upsample else lr
    x0 = jnp.zeros((1, in_hw, in_hw, c), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)
    x = jax.random.uniform(jax.random.key(2), (B, in_hw, in_hw, c),
                           jnp.float32)

    keep = (set(sys.argv[5].split(","))  # comma-separated variant filter
            if len(sys.argv) > 5 else None)

    def want(name):
        return keep is None or name in keep

    fns = {}
    if want("bf16"):
        fns["bf16"] = lambda z: model.apply(variables, z, train=False)
    if want("int8_dynamic"):
        fns["int8_dynamic"] = lambda z: quantized_apply(
            model, variables, z, train=False)
    if want("int8_static"):
        scales = calibrate_scales(model, variables, x[:1], train=False)
        print(json.dumps({"calibrated_sites": len(scales)}),
              file=sys.stderr)
        fns["int8_static"] = lambda z: quantized_apply(
            model, variables, z, scales=scales, train=False)
    if hasattr(model, "tail"):
        try:
            from sr.kernels.fused_tail import (
                make_fused_tail_predict, make_fused_tail_predict_quant)

            if want("bf16_fused"):
                fns["bf16_fused"] = make_fused_tail_predict(
                    model, variables)
            if want("int8_static_fused"):
                quant_fused = make_fused_tail_predict_quant(
                    model, variables)
                quant_fused(x)  # eager warm runs the lazy calibration
                fns["int8_static_fused"] = quant_fused
                print("[qe2e] quant-fused calibrated", file=sys.stderr)
        except (ValueError, KeyError) as e:
            print(f"[qe2e] no fused tail: {e}", file=sys.stderr)
        try:
            from sr.kernels.shuffle_fold import (
                make_folded_tail_predict, make_folded_tail_predict_quant)

            if want("bf16_folded"):
                fns["bf16_folded"] = make_folded_tail_predict(
                    model, variables)
            if want("int8_static_folded"):
                quant_folded = make_folded_tail_predict_quant(
                    model, variables)
                quant_folded(x)  # eager warm runs the lazy calibration
                fns["int8_static_folded"] = quant_folded
                print("[qe2e] quant-folded calibrated", file=sys.stderr)
        except (ValueError, KeyError, AssertionError) as e:
            print(f"[qe2e] no folded tail: {e}", file=sys.stderr)

    out_mp = B * (lr * cfg.scale_factor) ** 2 / 1e6
    results = {}
    for name, fn in fns.items():
        def body(z, _, fn=fn):
            y = fn(z)
            m = jnp.mean(y.astype(jnp.float32)) * 1e-9
            return z + m, ()

        @jax.jit
        def run(z, body=body):
            zK, _ = lax.scan(body, z, None, length=K)
            return jnp.sum(zK.astype(jnp.float32))

        for attempt in range(3):
            try:
                float(run(x))
                break
            except Exception as e:  # noqa: BLE001 — remote compile flake
                print(f"[qe2e] {name} attempt {attempt}: {e}",
                      file=sys.stderr)
                time.sleep(10)
        else:
            continue
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2] / K
        results[name] = dt
        print(json.dumps({
            "variant": name, "model": model_name, "lr": lr, "B": B,
            "K": K, "ms_per_batch": round(dt * 1e3, 2),
            "mps": round(out_mp / dt, 1)}), flush=True)
    if results:
        # baseline = first variant that ran (canonical order puts the
        # bf16 reference first in any filter set that includes one)
        base_name = next(iter(results))
        base = results[base_name]
        print(json.dumps({f"speedup_vs_{base_name}": {
            k: round(base / v, 2) for k, v in results.items()
        }}), flush=True)


if __name__ == "__main__":
    main()
