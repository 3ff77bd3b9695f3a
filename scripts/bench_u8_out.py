"""On-device u8 output: device-time and fetch-time A/B (sr.quant.to_u8).

Three questions on the real chip:
1. Does the u8 epilogue change the serving program's device time?
   (chained scan, bf16-fused EDSR, b16) — expect ~neutral-to-faster:
   the final d2s copy moves 1/2 the bytes vs bf16 and the round/clip
   fuses.
2. How much does it cut the OUTPUT FETCH wall time? (b1, f32 vs u8
   device→host — 4x fewer bytes; this relay's D2H is the extreme case,
   production PCIe sees the same ratio.)
3. Marginal linearity of the int8-fused headline: b32→b64 vs b64→b128
   increments should agree if the marginal estimator is trustworthy.

Usage: python scripts/bench_u8_out.py [LR] [B] [K]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sr.kernels.fused_tail import make_fused_tail_predict
from sr.models.registry import get_spec
from sr.quant import to_u8
from sr.utils.config import SRConfig


def main() -> None:
    lr = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 30

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=4,
                   dtype="bfloat16")
    model = get_spec("EDSR").make_model(cfg)
    x0 = jnp.zeros((1, 8, 8, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)
    fused = make_fused_tail_predict(model, variables)
    x = jax.random.uniform(jax.random.key(2), (B, lr, lr, 3), jnp.float32)

    # 1. device time: chained scan, consuming the full output either way
    def run_variant(post, label):
        def body(z, _):
            y = post(fused(z))
            m = jnp.mean(y.astype(jnp.float32)) * 1e-9
            return z + m, ()

        @jax.jit
        def run(z):
            zK, _ = lax.scan(body, z, None, length=K)
            return jnp.sum(zK.astype(jnp.float32))

        float(run(x))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(run(x))
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2] / K
        print(json.dumps({"q": "device", "variant": label, "B": B,
                          "ms_per_batch": round(dt * 1e3, 2)}), flush=True)
        return dt

    t_f = run_variant(lambda y: y, "fused_float")
    t_u = run_variant(to_u8, "fused_u8")
    print(json.dumps({"q": "device", "u8_vs_float":
                      round(t_f / t_u, 3)}), flush=True)

    # 2. fetch wall time at b1: full output to host
    f32_fn = jax.jit(lambda z: fused(z).astype(jnp.float32))
    u8_fn = jax.jit(lambda z: to_u8(fused(z)))
    x1 = x[:1]
    for fn, label in [(f32_fn, "f32"), (u8_fn, "u8")]:
        y = fn(x1)
        np.asarray(y)  # warm the transfer path
        times = []
        for _ in range(3):
            y = fn(x1)
            t0 = time.perf_counter()
            np.asarray(y)
            times.append(time.perf_counter() - t0)
        print(json.dumps({"q": "fetch_b1", "dtype": label,
                          "bytes": int(np.asarray(y).nbytes),
                          "fetch_s": round(min(times), 3)}), flush=True)

    # 3. marginal linearity of the int8-fused headline estimator
    from sr.kernels.fused_tail import make_fused_tail_predict_quant

    qfn = make_fused_tail_predict_quant(model, variables)
    qfn(x[:1])  # calibrate

    @jax.jit
    def qsum(z):
        return jnp.sum(qfn(z).astype(jnp.float32))

    xs = {b: jax.random.uniform(jax.random.key(3), (b, lr, lr, 3),
                                jnp.bfloat16) for b in (32, 64, 128)}
    t = {}
    for b, xb in xs.items():
        float(qsum(xb))
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(3):
                v = qsum(xb)
            float(v)
            reps.append((time.perf_counter() - t0) / 3)
        t[b] = sorted(reps)[len(reps) // 2]
        print(json.dumps({"q": "marginal", "b": b,
                          "ms": round(t[b] * 1e3, 2)}), flush=True)
    px = (lr * 4) ** 2 / 1e6
    print(json.dumps({
        "q": "marginal",
        "mps_32_64": round(32 * px / (t[64] - t[32]), 0),
        "mps_64_128": round(64 * px / (t[128] - t[64]), 0),
    }), flush=True)


if __name__ == "__main__":
    main()
