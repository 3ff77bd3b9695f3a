"""Single-image serving latency: kill the fixed ~4 ms input relayout.

Round-2 finding (PERF.md): every dispatch pays ~4 ms of input-side
``reshape.1`` + ``copy`` — the NHWC→padded-lane relayout of the input —
batch-independent and real latency for single-image serving. Input dtype
was measured a no-op; the lever is the LAYOUT. This script measures the
untried fix: compile with ``Layout.AUTO`` input layouts and
``jax.device_put`` the request into the compiled program's preferred
format, so the relayout happens at buffer placement (off the dispatch
critical path / amortized by double-buffering) instead of inside every
program execution.

For each EDSR serving variant (exact / folded / fused) prints per-op
device-time attribution (sr.utils.profiling.op_profile) for:
  default  — host f32 NHWC input, default layout (the round-2 baseline)
  auto     — AUTO-layout program + input pre-placed in its format

Usage: python scripts/bench_serve_latency.py [BATCH] [LR]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp
    import jax.experimental.layout as L

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig
    from sr.utils.profiling import op_profile

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    lr = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=4,
                   dtype="bfloat16")
    model = get_spec("EDSR").make_model(cfg)
    x0 = jnp.zeros((1, lr, lr, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(0), x0, train=False)

    from sr.kernels.fused_tail import make_fused_tail_predict
    from sr.kernels.shuffle_fold import make_folded_tail_predict

    fns = {
        "exact": lambda x: model.apply(variables, x, train=False),
        "folded": make_folded_tail_predict(model, variables),
        "fused": make_fused_tail_predict(model, variables),
    }
    x = jax.random.normal(jax.random.key(1), (B, lr, lr, 3), jnp.float32)
    try:  # int8-static body + int8 collapsed tail (the fast int8 mode)
        from sr.kernels.fused_tail import make_fused_tail_predict_quant

        qfn = make_fused_tail_predict_quant(model, variables)
        qfn(x)  # eager warm runs the lazy calibration
        fns["quant_fused"] = qfn
    except (ValueError, KeyError) as e:  # noqa: BLE001
        print(f"[stage] quant_fused unavailable: {e}", file=sys.stderr)

    def relayout_ms(ops):
        # input-side layout ops: copies/reshapes/transposes outside the
        # main fusion stream
        return sum(o["ms_per_iter"] for o in ops
                   if any(k in o["name"].lower()
                          for k in ("copy", "reshape", "transpose"))
                   and "fusion" not in o["name"].lower())

    for name, fn in fns.items():
        rows = {}
        # --- default layout (baseline) ---
        print(f"[stage] {name}: compile default", file=sys.stderr, flush=True)
        jfn = jax.jit(fn)
        prof = op_profile(jfn, x, iters=5)
        total = sum(o["ms_per_iter"] for o in prof["ops"])
        rows["default"] = {"total_ms": round(total, 2),
                           "layout_ms": round(relayout_ms(prof["ops"]), 2)}
        # --- AUTO input layout + pre-placed input ---
        print(f"[stage] {name}: compile AUTO", file=sys.stderr, flush=True)
        afn = jax.jit(fn, in_shardings=L.Format(L.Layout.AUTO))
        compiled = afn.lower(x).compile()
        fmt = compiled.input_formats[0][0]
        xa = jax.device_put(x, fmt)
        # call the compiled executable directly: a fresh afn(xa) call
        # re-traces and AUTO cannot bind a concrete-layout argument
        prof_a = op_profile(compiled, xa, iters=5)
        total_a = sum(o["ms_per_iter"] for o in prof_a["ops"])
        rows["auto"] = {"total_ms": round(total_a, 2),
                        "layout_ms": round(relayout_ms(prof_a["ops"]), 2),
                        "format": str(fmt.layout)}
        print(json.dumps({"variant": name, "batch": B, **rows}), flush=True)
        top = sorted(prof["ops"], key=lambda o: -o["ms_per_iter"])[:4]
        top_a = sorted(prof_a["ops"], key=lambda o: -o["ms_per_iter"])[:4]
        for tag, t in (("default", top), ("auto", top_a)):
            for o in t:
                print(f"  [{name}/{tag}] {o['name'][:60]:60s} "
                      f"{o['ms_per_iter']:.3f} ms {o['pct']:.0f}%",
                      file=sys.stderr)


if __name__ == "__main__":
    main()
