"""Measure int8 ConvTranspose (VERDICT r3 next #8): FSRCNN/LapSRN
serving throughput with deconv tails in compute-dtype vs int8.

Variants (each jitted once, marginal-timed between two batch sizes so
the relay's fixed dispatch cost cancels — bench.py method):
  * exact      — bf16 graph
  * int8-conv  — static-int8 body convs, deconvs pass through (the
                 shipped default)
  * int8-all   — static-int8 body convs + int8 deconvs (the candidate)

Usage: python scripts/bench_deconv_int8.py [LR_SIZE] [B_SMALL B_LARGE]
Prints one JSON line per model; PERF.md records the ship/reject call.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

LR = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B_S = int(sys.argv[2]) if len(sys.argv) > 2 else 64
B_L = int(sys.argv[3]) if len(sys.argv) > 3 else 192
ITERS, REPEATS = 3, 5


def timed(fn, x):
    float(fn(x))  # warm/compile + scalar sync (relay-safe)
    t0 = time.perf_counter()
    vals = [fn(x) for _ in range(ITERS)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / ITERS


def marginal_mps(fn, xs, out_px):
    vals = []
    for _ in range(REPEATS):
        t_s = timed(fn, xs[B_S])
        t_l = timed(fn, xs[B_L])
        if t_l - t_s > 2e-3:
            vals.append((B_L - B_S) * out_px / (t_l - t_s) / 1e6)
        print(f"  b{B_S} {t_s * 1e3:.1f} ms, b{B_L} {t_l * 1e3:.1f} ms",
              file=sys.stderr)
    return statistics.median(vals) if vals else 0.0


def main():
    import jax
    import jax.numpy as jnp

    from sr.models.registry import get_spec
    from sr.quant import calibrate_scales, quantized_apply
    from sr.utils.config import SRConfig

    key = jax.random.key(0)
    for name in ("FSRCNN", "LapSRN"):
        spec = get_spec(name)
        cfg = SRConfig(model_name=name, scale_factor=4, num_channels=1,
                       dtype="bfloat16")
        model = spec.make_model(cfg)
        v = jax.jit(model.init, static_argnames=("train",))(
            key, jnp.zeros((1, 8, 8, 1)), train=False)
        xs = {b: jax.random.uniform(key, (b, LR, LR, 1), jnp.bfloat16)
              for b in (B_S, B_L)}
        out_px = (LR * 4) ** 2
        scales = calibrate_scales(
            model, v, jax.random.uniform(key, (1, LR, LR, 1),
                                         jnp.float32), train=False)

        def mk(quantize, deconv):
            if not quantize:
                return jax.jit(lambda x: jnp.sum(model.apply(
                    v, x, train=False).astype(jnp.float32)))
            return jax.jit(lambda x: jnp.sum(quantized_apply(
                model, v, x, scales=scales, quantize_deconv=deconv,
                train=False).astype(jnp.float32)))

        out = {"model": name, "lr_size": LR, "b": [B_S, B_L]}
        for label, fn in (("exact", mk(False, False)),
                          ("int8_conv", mk(True, False)),
                          ("int8_all", mk(True, True))):
            print(f"[{name}] {label}", file=sys.stderr)
            out[f"mps_{label}"] = round(marginal_mps(fn, xs, out_px), 1)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
