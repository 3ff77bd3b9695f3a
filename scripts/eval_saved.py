"""Evaluate SAVED zoo params — one eval variant per process.

Companion to ``train_zoo.py --save_params``: remote eval compiles can
hang the relay indefinitely (CLAUDE.md), and train_zoo runs every eval
variant (plain / '+' / int8 ladder) inside the training process — one
hung compile costs them all. This script re-runs any single variant
from the saved ``.npz``, so a hang costs exactly one variant and the
others can be collected by separate invocations.

Usage:
  python scripts/eval_saved.py PARAMS.npz --model EDSR \
      --variant plain|ensemble|int8|int8_static|int8_lazy \
      --test_dataset procedural --scale_factor 4 --color ycbcr \
      [--base_filter 256 --num_resblocks 32 --res_scale 0.1] \
      [--append results.json]

``--color`` must match how the weights were TRAINED (pre-fix zoo runs
trained 3-channel models on ycbcr planes; post-fix runs use rgb —
RESULTS.md color-convention note).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("params")
    p.add_argument("--model", required=True)
    p.add_argument("--variant", default="plain",
                   choices=["plain", "ensemble", "int8", "int8_static",
                            "int8_lazy"])
    p.add_argument("--test_dataset", default="procedural")
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--color", default=None,
                   help="dataset encoding the weights were trained in "
                        "(default: the model's convention — rgb for "
                        "3-channel models)")
    p.add_argument("--base_filter", type=int, default=None)
    p.add_argument("--num_resblocks", type=int, default=None)
    p.add_argument("--res_scale", type=float, default=None)
    p.add_argument("--num_recursions", type=int, default=None)
    p.add_argument("--host_metrics", action="store_true")
    p.add_argument("--append", default=None,
                   help="append the result row to this JSON list file")
    a = p.parse_args()

    import jax

    from sr.data.datasets import get_test_set
    from sr.eval.runner import evaluate
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import load_params
    from sr.utils.config import SRConfig

    spec = get_spec(a.model)
    overrides = {k: getattr(a, k) for k in
                 ("base_filter", "num_resblocks", "res_scale",
                  "num_recursions")
                 if getattr(a, k) is not None}
    cfg = SRConfig(model_name=a.model, scale_factor=a.scale_factor,
                   num_channels=spec.default_channels, dtype="bfloat16",
                   test_dataset=a.test_dataset, **overrides)
    model = spec.make_model(cfg)
    params, batch_stats = load_params(a.params)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    color = a.color or ("rgb" if spec.default_channels == 3 else "ycbcr")
    test_set = get_test_set(cfg.data_dir, a.test_dataset, color)
    ev = dict(
        channels=spec.default_channels, pre_upsample=spec.pre_upsample,
        dataset_name=a.test_dataset, color_space=color,
        on_device_metrics=not a.host_metrics,
    )

    predict = jax.jit(lambda x: model.apply(variables, x, train=False))
    if a.variant == "plain":
        fn = predict
    elif a.variant == "ensemble":
        from sr.eval.ensemble import make_self_ensemble_predict

        fn = make_self_ensemble_predict(predict)  # loop-of-8 (relay-safe)
    elif a.variant == "int8":
        from sr.quant import make_quantized_predict

        fn = make_quantized_predict(model, variables)
    elif a.variant == "int8_static":
        from sr.eval.runner import eval_model_inputs
        from sr.quant import calibrate_scales_batches, quantized_apply

        scales = calibrate_scales_batches(
            model, variables,
            eval_model_inputs(test_set, a.scale_factor,
                              spec.default_channels, spec.pre_upsample),
            train=False)
        fn = jax.jit(lambda x: quantized_apply(
            model, variables, x, scales=scales, train=False))
    else:  # int8_lazy
        from sr.quant import make_quantized_predict

        fn = make_quantized_predict(model, variables, mode="static")

    res = evaluate(fn, test_set, a.scale_factor, **ev)
    out = {"model": a.model, "variant": a.variant, "params": a.params,
           "color": color, **overrides, **res.summary()}
    print(json.dumps(out), flush=True)
    if a.append:
        try:
            rows = json.load(open(a.append))
        except (OSError, ValueError):
            rows = []
        rows.append(out)
        with open(a.append, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"appended -> {a.append}", flush=True)


if __name__ == "__main__":
    main()
