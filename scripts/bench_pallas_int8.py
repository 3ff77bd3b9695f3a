"""TPU gate for the Pallas int8 im2col conv (sr/kernels/int8_conv.py).

Two questions, in order:
1. Does Mosaic accept the kernel at EDSR body shapes? (Cannot be
   checked on CPU — round 2's depth_to_space kernel passed interpret
   mode and was rejected on TPU.)
2. If so, does the K=576 contraction beat XLA's int8 conv (~100
   TFLOP/s, at its K=64/N=64 utilization ceiling)? Chained-scan A/B,
   requant epilogue fused into both variants' chains.

Usage: python scripts/bench_pallas_int8.py [B] [HW] [C] [K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from sr.kernels.int8_conv import (
    conv3x3_int8_im2col,
    conv3x3_int8_reference,
)


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    HW = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 100

    kx, kw = jax.random.split(jax.random.key(0))
    q_x = jax.random.randint(kx, (B, HW, HW, C), -127, 128, jnp.int8)
    q_w = jax.random.randint(kw, (3, 3, C, C), -40, 40, jnp.int8)
    flops = 2 * 9 * B * HW * HW * C * C * K

    # gate 1: Mosaic acceptance + numeric equality on one batch
    try:
        got = conv3x3_int8_im2col(q_x[:1], q_w)
        want = conv3x3_int8_reference(q_x[:1], q_w)
        eq = bool(jnp.all(got == want))
        print(json.dumps({"mosaic": "accepted", "bit_exact": eq}),
              flush=True)
        if not eq:
            return
    except Exception as e:  # noqa: BLE001 — Mosaic rejection is a result
        print(json.dumps({"mosaic": "rejected", "error": str(e)[:400]}),
              flush=True)
        return

    from sr.kernels.int8_conv import conv3x3_bf16_im2col

    wbf = (q_w.astype(jnp.bfloat16) / (16.0 * C))
    xbf = q_x.astype(jnp.bfloat16) / 128.0

    def xla_bf16(x):
        return lax.conv_general_dilated(
            x, wbf, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    variants = {
        "xla_int8_conv": (lambda x: conv3x3_int8_reference(x, q_w), q_x),
        "pallas_im2col": (lambda x: conv3x3_int8_im2col(x, q_w), q_x),
        "xla_bf16_conv": (xla_bf16, xbf),
        "pallas_bf16_im2col": (lambda x: conv3x3_bf16_im2col(x, wbf),
                               xbf),
    }
    results = {}
    for name, (fn, x0) in variants.items():
        def body(x, _, fn=fn):
            y = fn(x)
            if y.dtype == jnp.int32:
                return (y >> 8).astype(jnp.int8), ()
            return y.astype(jnp.bfloat16), ()

        @jax.jit
        def run(x, body=body):
            xK, _ = lax.scan(body, x, None, length=K)
            return jnp.sum(xK.astype(jnp.float32))

        for attempt in range(3):
            try:
                float(run(x0))
                break
            except Exception as e:  # noqa: BLE001
                print(f"[pallas-i8] {name} attempt {attempt}: {e}",
                      file=sys.stderr)
                time.sleep(10)
        else:
            continue
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x0))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        results[name] = dt
        print(json.dumps({"variant": name, "B": B, "HW": HW, "C": C,
                          "K": K, "ms": round(dt * 1e3, 2),
                          "tflops": round(flops / dt / 1e12, 1)}),
              flush=True)
    for pallas, ref in [("pallas_im2col", "xla_int8_conv"),
                        ("pallas_bf16_im2col", "xla_bf16_conv")]:
        if pallas in results and ref in results:
            print(json.dumps({f"{pallas}_speedup": round(
                results[ref] / results[pallas], 2)}), flush=True)

    # phase 3: full-model static-int8 A/B (interceptor conv_backend)
    from sr.models.registry import get_spec
    from sr.quant import calibrate_scales, quantized_apply
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", scale_factor=4, num_channels=3,
                   dtype="bfloat16")
    model = get_spec("EDSR").make_model(cfg)
    xm = jax.random.uniform(jax.random.key(3), (B, HW, HW, 3),
                            jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(4), xm[:1], train=False)
    scales = calibrate_scales(model, variables, xm[:1], train=False)
    mres = {}
    for backend in ("xla", "pallas"):
        def mbody(z, _, backend=backend):
            y = quantized_apply(model, variables, z, scales=scales,
                                conv_backend=backend, train=False)
            s = (jnp.mean(y.astype(jnp.float32)) * 1e-9).astype(z.dtype)
            return z + s, ()

        @jax.jit
        def mrun(z, mbody=mbody):
            zK, _ = lax.scan(mbody, z, None, length=max(K // 10, 3))
            return jnp.sum(zK.astype(jnp.float32))

        try:
            float(mrun(xm))
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(mrun(xm))
                times.append(time.perf_counter() - t0)
            dt = sorted(times)[len(times) // 2]
            mres[backend] = dt
            print(json.dumps({"model_variant": f"edsr_static_{backend}",
                              "ms": round(dt * 1e3, 2)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"model_variant": backend,
                              "error": str(e)[:300]}), flush=True)
    if len(mres) == 2:
        print(json.dumps({"model_pallas_speedup": round(
            mres["xla"] / mres["pallas"], 2)}), flush=True)


if __name__ == "__main__":
    main()
