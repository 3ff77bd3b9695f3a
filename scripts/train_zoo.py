"""Train the whole zoo on a corpus and record eval PSNR per model.

Usage: python scripts/train_zoo.py [--steps N] [--out results_zoo.json]

With network/datasets available this reproduces the reference recipes on
BSDS300 → Set5; in network-less environments it runs the synthetic
corpus end-to-end (recipe validation: every model must beat bicubic).
Writes a JSON table consumed by RESULTS.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np


def run_one(name: str, steps: int, train_ds: str, test_ds: str,
            spd: int = 1, corpus: int = 0, vgg: str | None = None,
            scale_factor: int = 4, quant_eval: bool = False,
            crop: int = 0, ensemble_eval: bool = False,
            overrides: dict | None = None,
            device_metrics: bool = True,
            save_params_path: str | None = None,
            skip_eval: bool = False) -> dict:
    from sr.data.datasets import get_training_set
    from sr.data.pipeline import build_patch_pipeline
    from sr.eval.runner import evaluate
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    spec = get_spec(name)
    cfg = SRConfig(
        model_name=name, scale_factor=scale_factor,
        crop_size=(crop or 64) // scale_factor * scale_factor,  # 63 at x3
        batch_size=32,
        num_channels=spec.default_channels, dtype="bfloat16",
        steps_per_epoch=min(steps, 200),
        num_epochs=max(1, steps // min(steps, 200)),
        train_dataset=train_ds, test_dataset=test_ds,
        pretrain_epochs=max(1, steps // min(steps, 200) // 3),
        steps_per_dispatch=spd,  # scan-fused trainer (non-GAN models)
        vgg_weights_path=vgg if spec.is_gan else None,
        # phi_22 keeps random/synthetic towers numerically alive (deep
        # random towers decay to ~0 features); real weights work at either
        vgg_output_layer="relu2_2" if vgg else "relu5_4",
        **(overrides or {}),  # paper-scale topology knobs (VERDICT r3 #5)
    )
    # color convention must match sr.main.build_pipeline: 3-channel
    # models train/eval in RGB (the reference convention for
    # EDSR/SRResNet/SRGAN — SURVEY §2.2), 1-channel models take Y of
    # YCbCr. Before round 4 session 6 this defaulted to ycbcr for ALL
    # models: self-consistent (train and eval both YCbCr, Y-PSNR still
    # Y-PSNR) but divergent from the CLI path — RESULTS.md marks the
    # affected procedural 3-channel rows.
    color_c = spec.default_channels
    color = "rgb" if color_c == 3 else "ycbcr"
    if corpus and train_ds == "synthetic":
        from sr.data.datasets import SyntheticDataset

        train_set = SyntheticDataset(num_images=corpus, size=(160, 160),
                                     channels=3, seed=100)
    else:
        train_set = get_training_set(cfg.data_dir, cfg.train_dataset, color)
    images = [im if color_c == 3 else im[..., :1] for im in
              (train_set[i] for i in range(len(train_set)))]
    # corpus-aware construction (random-scale aug when the corpus allows
    # — worth ~1.8 dB of generalization on the synthetic corpus)
    pipe = build_patch_pipeline(cfg, spec, images)
    rng = jax.random.key(0)
    b0 = pipe(rng)
    t0 = time.time()

    if spec.is_gan:
        from sr.train.gan import GANTrainer

        tr = GANTrainer(cfg)
        g, d = tr.init_states(rng, b0["lr"][:1], b0["hr"][:1])
        g, d = tr.fit(g, d, pipe)
        predict = lambda x: tr.predict(g, x)  # noqa: E731
        q_model, q_vars = tr.g_model, {"params": g.params}
        if g.batch_stats is not None:
            q_vars["batch_stats"] = g.batch_stats
    else:
        from sr.train.trainer import Trainer

        tr = Trainer(cfg)
        state = tr.init_state(rng, b0[spec.input_key()][:1])
        state = tr.fit(state, pipe)
        pj = tr.make_predict_fn()
        predict = lambda x: pj(state.params, state.batch_stats, x)  # noqa: E731
        q_model, q_vars = tr.model, {"params": state.params}
        if state.batch_stats is not None:
            q_vars["batch_stats"] = state.batch_stats

    if save_params_path:
        # persist trained weights BEFORE eval: remote eval compiles can
        # hang indefinitely (relay flake, CLAUDE.md) — without this a
        # hung eval costs the whole training run (lost a 50k-step
        # paper-width EDSR in round 4)
        from sr.utils.checkpoint import save_params as _save_params

        ppath = save_params_path.replace("{model}", name)
        _save_params(ppath, q_vars["params"], q_vars.get("batch_stats"))
        print(f"[zoo] saved trained params -> {ppath}", flush=True)

    if skip_eval:
        # train-only mode: at paper width the in-process eval compile is
        # the hang-prone part (a killed client leaves the remote wedged —
        # CLAUDE.md); evaluate from the saved params via eval_saved.py in
        # separate processes instead
        return {"model": name, "steps": steps,
                "train_s": round(time.time() - t0, 1),
                "params": save_params_path and
                save_params_path.replace("{model}", name)}

    from sr.data.datasets import get_test_set

    test_set = get_test_set(cfg.data_dir, cfg.test_dataset, color)
    # shared eval kwargs; on_device_metrics fetches only scalars (this
    # environment's D2H relay makes full-image fetches the dominant wall
    # cost of a zoo run — equivalence locked by tests/test_eval.py)
    ev = dict(
        channels=color_c, pre_upsample=spec.pre_upsample,
        dataset_name=cfg.test_dataset,
        color_space=color,  # matches how test_set was loaded above
        on_device_metrics=device_metrics,
    )
    res = evaluate(predict, test_set, cfg.scale_factor, **ev)
    out = {
        "model": name, "steps": steps,
        "train_s": round(time.time() - t0, 1),
        **res.summary(),
    }
    if ensemble_eval:
        # the '+' column: D4 geometric self-ensemble on the SAME weights
        from sr.eval.ensemble import make_self_ensemble_predict

        eres = evaluate(
            make_self_ensemble_predict(predict), test_set,
            cfg.scale_factor, **ev,
        )
        out["psnr_plus"] = eres.summary()["psnr_sr"]
        out["ssim_plus"] = eres.summary().get("ssim_sr")
    if quant_eval:
        # int8 PTQ quality on the SAME trained weights + eval substrate
        from sr.quant import make_quantized_predict

        qfn = make_quantized_predict(q_model, q_vars)
        qres = evaluate(qfn, test_set, cfg.scale_factor, **ev)
        out["psnr_int8"] = qres.summary()["psnr_sr"]
        out["ssim_int8"] = qres.summary().get("ssim_sr")
        # static-calibrated scales (the fast int8 mode), calibrated on
        # the FULL eval corpus (the recommended deployment procedure —
        # single-image lazy calibration saturates on range-diverse
        # datasets; that serving-default behavior is the _lazy column)
        import jax as _jax

        from sr.eval.runner import eval_model_inputs
        from sr.quant import calibrate_scales_batches, quantized_apply

        scales = calibrate_scales_batches(
            q_model, q_vars,
            eval_model_inputs(test_set, cfg.scale_factor, color_c,
                              spec.pre_upsample),
            train=False)
        sfn = _jax.jit(lambda x: quantized_apply(
            q_model, q_vars, x, scales=scales, train=False))
        sres = evaluate(sfn, test_set, cfg.scale_factor, **ev)
        out["psnr_int8_static"] = sres.summary()["psnr_sr"]
        out["ssim_int8_static"] = sres.summary().get("ssim_sr")
        lfn = make_quantized_predict(q_model, q_vars, mode="static")
        lres = evaluate(lfn, test_set, cfg.scale_factor, **ev)
        out["psnr_int8_static_lazy"] = lres.summary()["psnr_sr"]
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--spd", type=int, default=1,
                   help="steps per dispatch (scan-fused trainer)")
    p.add_argument("--corpus", type=int, default=0,
                   help="synthetic training-corpus size (0 = default 32)")
    p.add_argument("--train_dataset", default="synthetic")
    p.add_argument("--test_dataset", default="synthetic")
    p.add_argument("--out", default="results_zoo.json")
    p.add_argument("--models", nargs="*", default=None)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--vgg", default=None,
                   help="VGG19 .pth for the SRGAN perceptual term "
                        "(see scripts/make_synthetic_vgg.py), or 'random'")
    p.add_argument("--quant_eval", action="store_true",
                   help="also evaluate the int8-quantized forward "
                        "(sr.quant) on the trained weights")
    p.add_argument("--ensemble_eval", action="store_true",
                   help="also evaluate the D4 geometric self-ensemble "
                        "('+' mode) on the trained weights")
    p.add_argument("--crop", type=int, default=0,
                   help="HR crop size (0 = 64; use 128+ at x8 so the "
                        "LR crop keeps enough context)")
    # paper-scale topology overrides (VERDICT r3 #5: DRCN base_filter
    # 256, EDSR 32x256 with res_scale 0.1)
    p.add_argument("--base_filter", type=int, default=None)
    p.add_argument("--num_resblocks", type=int, default=None)
    p.add_argument("--res_scale", type=float, default=None)
    p.add_argument("--num_recursions", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--adv_d_train_mode", action="store_true", default=None,
                   help="run D in train mode (batch-stat BN) during G's "
                        "adversarial pass — the reference's literal "
                        "module state (PARITY delta 10 A/B arm; default "
                        "is eval-mode D)")
    p.add_argument("--save_params", default=None,
                   help="save trained params (flattened .npz, "
                        "sr.utils.checkpoint.save_params) to this path "
                        "before eval; '{model}' expands to the model "
                        "name. Insurance against eval-phase relay "
                        "hangs: weights survive a killed eval.")
    p.add_argument("--skip_eval", action="store_true",
                   help="train + save_params only, no in-process eval "
                        "(use eval_saved.py per variant — hang "
                        "insurance for paper-width compiles)")
    p.add_argument("--host_metrics", action="store_true",
                   help="compute eval metrics on host from fetched "
                        "images (default: on-device scalars — the relay "
                        "D2H makes image fetches the dominant zoo cost)")
    a = p.parse_args()
    if a.skip_eval and not a.save_params:
        # train-only with nowhere to save = hours of chip time producing
        # nothing (no eval ran, no weights kept)
        p.error("--skip_eval requires --save_params (otherwise the "
                "trained weights are discarded)")
    overrides = {k: getattr(a, k) for k in
                 ("base_filter", "num_resblocks", "res_scale",
                  "num_recursions", "lr", "adv_d_train_mode")
                 if getattr(a, k) is not None}

    from sr.models.registry import available_models

    models = a.models or [m for m in available_models()]
    results = []
    for name in models:
        try:
            results.append(
                run_one(name, a.steps, a.train_dataset, a.test_dataset,
                        a.spd, a.corpus, a.vgg, a.scale_factor,
                        a.quant_eval, a.crop, a.ensemble_eval,
                        overrides or None,
                        device_metrics=not a.host_metrics,
                        save_params_path=a.save_params,
                        skip_eval=a.skip_eval)
            )
        except Exception as e:  # noqa: BLE001
            print(f"[zoo] {name} FAILED: {e}", file=sys.stderr, flush=True)
            results.append({"model": name, "error": str(e)})
        # write INCREMENTALLY: a multi-model zoo run can hit its outer
        # timeout (or a relay hang) mid-zoo — completed rows must
        # survive, same insurance rationale as --save_params
        with open(a.out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {a.out}", flush=True)


if __name__ == "__main__":
    main()
