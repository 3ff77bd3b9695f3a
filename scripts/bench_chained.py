"""Chained-scan end-to-end forward benchmark (relay-robust).

K data-dependent forwards inside ONE ``lax.scan`` dispatch: each step
reduces the FULL output to a scalar that perturbs the next input, so
XLA can neither hoist the forward out of the loop nor dead-code-shrink
the full-resolution ops (both failure modes measured — PERF.md
"phase-folded output conv", method caveat 3). One dispatch amortizes
the relay's fixed cost and any per-dispatch allocation effects.

Usage: python scripts/bench_chained.py [MODEL] [K] [BATCH]
Prints one JSON line per available variant (exact / folded / fused).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    model_name = sys.argv[1] if len(sys.argv) > 1 else "EDSR"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    LR = 128

    cfg = SRConfig(model_name=model_name, num_channels=3, scale_factor=4,
                   dtype="bfloat16")
    model = get_spec(model_name).make_model(cfg)
    x0 = jnp.zeros((1, LR, LR, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)

    fns = {"exact": lambda x: model.apply(variables, x, train=False)}
    from sr.kernels.shuffle_fold import make_folded_tail_predict

    fns["folded"] = make_folded_tail_predict(model, variables)
    try:
        from sr.kernels.fused_tail import make_fused_tail_predict

        fns["fused"] = make_fused_tail_predict(model, variables)
    except (ValueError, KeyError):
        pass

    def chained(fn):
        def body(x, _):
            y = fn(x)
            m = jnp.mean(y.astype(jnp.float32)) * 1e-9
            return x + m.astype(x.dtype), ()

        @jax.jit
        def run(x0):
            xK, _ = jax.lax.scan(body, x0, None, length=K)
            return jnp.sum(xK.astype(jnp.float32))

        return run

    out_mp = (LR * cfg.scale_factor) ** 2 / 1e6
    x = jax.random.normal(jax.random.key(2), (B, LR, LR, 3), jnp.bfloat16)
    for name, fn in fns.items():
        run = chained(fn)
        float(run(x))  # compile+warm
        t0 = time.perf_counter()
        n = 3
        vals = [run(x) for _ in range(n)]
        for v in vals:
            float(v)
        dt = (time.perf_counter() - t0) / n
        ms_img = dt / (K * B) * 1e3
        print(json.dumps({
            "model": model_name, "variant": name, "K": K, "batch": B,
            "ms_per_img": round(ms_img, 3),
            "mps": round(out_mp / (ms_img / 1e3), 1),
        }), flush=True)


if __name__ == "__main__":
    main()
