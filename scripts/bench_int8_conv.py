"""Int8 conv formulation A/B at EDSR body shapes (relay-robust).

PERF.md round-3 finding: int8 PTQ through ``lax.conv`` measures 0.89x
bf16 — XLA's TPU conv lowering does not hit the 2x int8 MXU rate.
``bench_int8_matmul.py`` shows raw int8 ``dot_general`` DOES run ~1.5x
bf16. This script A/Bs conv formulations that route the conv through
dot_general instead:

  bf16_conv   — lax.conv in bf16 (the shipped fast path; baseline)
  int8_conv   — lax.conv s8xs8->s32 (the shipped quantized path)
  bf16_9tap   — 9 shifted dot_generals, bf16 (formulation overhead ref)
  int8_9tap   — 9 shifted dot_generals, s8xs8->s32 (the candidate)

All variants are self-chaining (Cout == Cin): step t+1's input is step
t's requantized output, inside one ``lax.scan`` dispatch, so nothing
hoists and the requantize epilogue fuses like production.

Usage: python scripts/bench_int8_conv.py [B] [HW] [C] [K]
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

DN = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                ("NHWC", "HWIO", "NHWC"))


def conv_9tap(x_pad, w_taps, H, W, preferred):
    """3x3 SAME conv as 9 shifted (BHW,C)@(C,Cout) dots.

    x_pad: (B, H+2, W+2, C); w_taps: (9, C, Cout).
    """
    B = x_pad.shape[0]
    C = x_pad.shape[3]
    acc = None
    for t in range(9):
        dy, dx = divmod(t, 3)
        xs = lax.slice(x_pad, (0, dy, dx, 0), (B, dy + H, dx + W, C))
        xs2 = xs.reshape(B * H * W, C)
        p = lax.dot_general(xs2, w_taps[t], (((1,), (0,)), ((), ())),
                            preferred_element_type=preferred)
        acc = p if acc is None else acc + p
    return acc.reshape(B, H, W, w_taps.shape[2])


def bench(B: int, HW: int, C: int, K: int) -> None:
    H = W = HW
    flops = 2 * 9 * B * H * W * C * C * K
    key = jax.random.key(0)
    w8 = jax.random.randint(key, (3, 3, C, C), -40, 40, jnp.int8)
    w_taps8 = w8.reshape(9, C, C)
    wbf = (w8.astype(jnp.bfloat16) / (16.0 * C))
    w_tapsbf = wbf.reshape(9, C, C)
    x8 = jax.random.randint(jax.random.key(1), (B, H, W, C), -127, 127,
                            jnp.int8)
    xbf = x8.astype(jnp.bfloat16) / 128.0

    def body_bf_conv(x, _):
        y = lax.conv_general_dilated(
            x, wbf, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16), ()

    def body_i8_conv(x, _):
        y = lax.conv_general_dilated(
            x, w8, (1, 1), "SAME", dimension_numbers=DN,
            preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8), ()

    def body_bf_9tap(x, _):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = conv_9tap(xp, w_tapsbf, H, W, jnp.float32)
        return y.astype(jnp.bfloat16), ()

    def body_i8_9tap(x, _):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = conv_9tap(xp, w_taps8, H, W, jnp.int32)
        return (y >> 8).astype(jnp.int8), ()

    variants = [
        ("bf16_conv", body_bf_conv, xbf),
        ("int8_conv", body_i8_conv, x8),
        ("bf16_9tap", body_bf_9tap, xbf),
        ("int8_9tap", body_i8_9tap, x8),
    ]
    results = {}
    for name, body, x0 in variants:
        @jax.jit
        def run(x, body=body):
            xK, _ = lax.scan(body, x, None, length=K)
            return jnp.sum(xK.astype(jnp.float32))

        for attempt in range(3):
            try:
                float(run(x0))
                break
            except Exception as e:  # noqa: BLE001 — remote compile flake
                print(f"[i8conv] {name} attempt {attempt}: {e}",
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
        row = {"variant": name, "B": B, "HW": HW, "C": C, "K": K,
               "ms": round(dt * 1e3, 2),
               "tflops": round(flops / dt / 1e12, 1)}
        print(json.dumps(row), flush=True)
    if "bf16_conv" in results:
        base = results["bf16_conv"]
        print(json.dumps({"speedup_vs_bf16_conv": {
            k: round(base / v, 2) for k, v in results.items()}}),
            flush=True)


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    HW = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 200
    bench(B, HW, C, K)
