"""Chained-scan end-to-end forward benchmark (relay-robust).

K data-dependent forwards inside ONE ``lax.scan`` dispatch: each step
reduces the FULL output to a scalar that perturbs the next input, so
XLA can neither hoist the forward out of the loop nor dead-code-shrink
the full-resolution ops (both failure modes measured — PERF.md
"phase-folded output conv", method caveat 3). One dispatch amortizes
the relay's fixed cost and any per-dispatch allocation effects.

Usage: python scripts/bench_chained.py [MODEL|all] [K] [BATCH]
Prints one JSON line per available variant (exact / folded / fused).
Pre-upsample models (SRCNN/VDSR/DRCN) are fed the bicubic-upscaled
input (512² for ×4 at LR 128 — their actual serving cost; the bicubic
upscale itself is not counted).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def bench_model(model_name: str, K: int, B: int, lr: int = 128) -> list:
    import jax
    import jax.numpy as jnp

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    spec = get_spec(model_name)
    cfg = SRConfig(model_name=model_name, num_channels=spec.default_channels,
                   scale_factor=4, dtype="bfloat16")
    model = spec.make_model(cfg)
    c = cfg.num_channels
    in_hw = lr * cfg.scale_factor if spec.pre_upsample else lr
    x0 = jnp.zeros((1, in_hw, in_hw, c), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)

    fns = {"exact": lambda x: model.apply(variables, x, train=False)}
    if any(k.startswith("upsample_") for k in variables["params"]):
        from sr.kernels.shuffle_fold import make_folded_tail_predict

        fns["folded"] = make_folded_tail_predict(model, variables)
    if hasattr(model, "tail"):
        try:
            from sr.kernels.fused_tail import make_fused_tail_predict

            fns["fused"] = make_fused_tail_predict(model, variables)
        except (ValueError, KeyError):
            pass

    def chained(fn):
        def body(x, _):
            # chain through a FULL reduction of y: every output element
            # is live and the next input depends on it (works whether or
            # not the output shape matches the input)
            y = fn(x)
            m = jnp.mean(y.astype(jnp.float32)) * 1e-9
            return x + m.astype(x.dtype), ()

        @jax.jit
        def run(x0):
            xK, _ = jax.lax.scan(body, x0, None, length=K)
            return jnp.sum(xK.astype(jnp.float32))

        return run

    out_mp = (lr * cfg.scale_factor) ** 2 / 1e6
    x = jax.random.normal(jax.random.key(2), (B, in_hw, in_hw, c),
                          jnp.bfloat16)
    rows = []
    for name, fn in fns.items():
        run = chained(fn)
        for attempt in range(3):
            try:
                float(run(x))  # compile+warm
                break
            except Exception as e:  # noqa: BLE001 — remote compile flake
                print(f"[chain] {model_name}/{name} attempt {attempt}: {e}",
                      file=sys.stderr)
                time.sleep(10)
        else:
            continue
        t0 = time.perf_counter()
        n = 3
        vals = [run(x) for _ in range(n)]
        for v in vals:
            float(v)
        dt = (time.perf_counter() - t0) / n
        ms_img = dt / (K * B) * 1e3
        row = {
            "model": model_name, "variant": name, "K": K, "batch": B,
            "ms_per_img": round(ms_img, 3),
            "mps": round(out_mp / (ms_img / 1e3), 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main() -> None:
    model_name = sys.argv[1] if len(sys.argv) > 1 else "EDSR"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    if model_name == "all":
        from sr.models.registry import available_models

        for name in available_models():
            bench_model(name, K, B)
    else:
        bench_model(model_name, K, B)


if __name__ == "__main__":
    main()
