"""Raw MXU rate probe: int8 vs bf16 dot_general (relay-robust).

Question (PERF.md int8 section): the int8 PTQ *conv* path measured
0.89x bf16 — is that because the chip/v5e XLA can't hit the 2x int8
MXU rate at all, or because the CONV lowering specifically fails to?
This probe times pure dot_general at matmul-friendly shapes with the
chained-scan method (each step's output feeds the next via a cheap
cast, so nothing hoists).

Usage: python scripts/bench_int8_matmul.py [DIM] [K]
Prints one JSON line per dtype with achieved TFLOP/s (TOP/s for int8).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax


def bench(dim: int, K: int) -> None:
    flops = 2 * dim**3 * K

    def run_variant(name, make_body, x0):
        @jax.jit
        def run(x):
            xK, _ = lax.scan(make_body, x, None, length=K)
            return jnp.sum(xK.astype(jnp.float32))

        for attempt in range(3):
            try:
                float(run(x0))  # compile + warm
                break
            except Exception as e:  # noqa: BLE001 — remote compile flake
                print(f"[int8mm] {name} attempt {attempt}: {e}",
                      file=sys.stderr)
                time.sleep(10)
        else:
            return
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x0))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        row = {"variant": name, "dim": dim, "K": K,
               "ms": round(dt * 1e3, 2),
               "tflops": round(flops / dt / 1e12, 1)}
        print(json.dumps(row), flush=True)

    key = jax.random.key(0)
    w8 = jax.random.randint(key, (dim, dim), -127, 127, jnp.int8)

    def body_i8(x, _):
        c = lax.dot_general(x, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        # chain through a scalar so the dependent op is O(dim^2) int8
        # adds, not an O(dim^2) int32 materialize+shift
        s = (jnp.sum(c, dtype=jnp.int32) & 1).astype(jnp.int8)
        return x + s, ()

    x8 = jax.random.randint(jax.random.key(1), (dim, dim), -127, 127,
                            jnp.int8)
    run_variant("int8xint8->int32", body_i8, x8)

    wbf = (w8.astype(jnp.bfloat16) / 128.0)

    def body_bf(x, _):
        c = lax.dot_general(x, wbf, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        s = (jnp.sum(c) * 1e-9).astype(jnp.bfloat16)
        return x + s, ()

    xbf = x8.astype(jnp.bfloat16) / 128.0
    run_variant("bf16xbf16->f32", body_bf, xbf)

    def body_f32(x, _):
        c = lax.dot_general(x, wbf.astype(jnp.float32),
                            (((1,), (0,)), ((), ())))
        return c * (1.0 / dim), ()

    run_variant("f32xf32", body_f32, xbf.astype(jnp.float32))


if __name__ == "__main__":
    dim = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    print(json.dumps({"devices": str(jax.devices())}), file=sys.stderr)
    bench(dim, K)
