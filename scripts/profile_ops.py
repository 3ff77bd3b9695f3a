"""Per-op device-time breakdown of a zoo model's forward (real chip).

Usage: python scripts/profile_ops.py [MODEL] [exact|folded|fused] [BATCH]

Prints the whole-program time and the top XLA ops by device time —
the per-op analysis pass over the relay (PERF.md "per-op profile").
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig
    from sr.utils.profiling import op_profile

    model_name = sys.argv[1] if len(sys.argv) > 1 else "EDSR"
    variant = sys.argv[2] if len(sys.argv) > 2 else "exact"
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    cfg = SRConfig(model_name=model_name, num_channels=3, scale_factor=4,
                   dtype="bfloat16")
    model = get_spec(model_name).make_model(cfg)
    x = jax.random.normal(jax.random.key(0), (batch, 128, 128, 3),
                          jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.key(1), x[:1], train=False)

    if variant == "quant":
        from sr.quant import calibrate_scales, quantized_apply

        scales = calibrate_scales(model, variables, x[:1], train=False)
        fn = jax.jit(lambda x: quantized_apply(
            model, variables, x, scales=scales, train=False))
    elif variant == "quant_fused":
        from sr.kernels.fused_tail import make_fused_tail_predict_quant

        qfn = make_fused_tail_predict_quant(model, variables)
        qfn(x[:1].astype(jnp.float32))  # eager warm runs calibration
        fn = qfn
    elif variant == "folded":
        from sr.kernels.shuffle_fold import make_folded_tail_predict

        fn = make_folded_tail_predict(model, variables)
    elif variant == "fused":
        from sr.kernels.fused_tail import make_fused_tail_predict

        fn = make_fused_tail_predict(model, variables)
    else:
        fn = jax.jit(lambda x: model.apply(variables, x, train=False))

    prof = op_profile(fn, x)
    print(json.dumps({"model": model_name, "variant": variant,
                      "batch": batch, "programs": prof["programs"][:3]}))
    for op in prof["ops"][:15]:
        print(f"{op['ms_per_iter']:9.3f} ms  {op['pct']:5.1f}%  "
              f"x{op['count_per_iter']:<6g} {op['name'][:70]}")


if __name__ == "__main__":
    main()
