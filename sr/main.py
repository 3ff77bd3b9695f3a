"""CLI driver: ``python -m sr.main --model_name SRCNN ...``

Flag-compatible with the reference (reference: main.py:parse_args /
check_args / main — same spelling for --model_name --num_channels
--scale_factor --crop_size --num_epochs --save_epochs --batch_size
--test_batch_size --lr --data_dir --save_dir --train_dataset
--test_dataset --num_threads), plus TPU-era additions (--dtype,
--steps_per_epoch, --mesh, --no_resume, --eval_only).

Flow mirrors the reference: build config → train (with resumable
checkpoints, JSONL + optional TB logging) → test (PSNR harness + panels).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax
import numpy as np

from sr.data.datasets import get_test_set, get_training_set
from sr.data.pipeline import PatchPipeline, build_patch_pipeline
from sr.eval.panels import plot_loss, plot_test_result, save_img
from sr.eval.runner import evaluate
from sr.models.registry import available_models, get_spec
from sr.utils.checkpoint import Checkpointer, run_meta, save_params
from sr.utils.config import SRConfig
from sr.utils.logging import JSONLLogger, TensorBoardLogger


def parse_args(argv=None) -> SRConfig:
    d = SRConfig()
    p = argparse.ArgumentParser(description="TPU-native super-resolution")
    p.add_argument("--model_name", default=d.model_name,
                   help=f"one of {available_models()}")
    p.add_argument("--num_channels", type=int, default=None,
                   help="1 (Y of YCbCr) or 3 (RGB); default per model")
    p.add_argument("--scale_factor", type=int, default=d.scale_factor)
    p.add_argument("--crop_size", type=int, default=d.crop_size)
    p.add_argument("--num_epochs", type=int, default=d.num_epochs)
    p.add_argument("--save_epochs", type=int, default=d.save_epochs)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--test_batch_size", type=int, default=d.test_batch_size)
    p.add_argument("--lr", type=float, default=None, help="default per model")
    p.add_argument("--data_dir", default=d.data_dir)
    p.add_argument("--save_dir", default=d.save_dir)
    p.add_argument("--train_dataset", default=d.train_dataset)
    p.add_argument("--test_dataset", default=d.test_dataset)
    p.add_argument("--num_threads", type=int, default=d.num_threads)
    # TPU-era flags
    p.add_argument("--dtype", default=d.dtype, choices=["float32", "bfloat16"])
    p.add_argument("--steps_per_epoch", type=int, default=d.steps_per_epoch)
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--mesh", type=int, nargs="*", default=None,
                   help="mesh shape, e.g. --mesh 8 for 8-way data parallel")
    p.add_argument("--no_resume", action="store_true")
    p.add_argument("--eval_only", action="store_true")
    p.add_argument("--use_pallas", action="store_true")
    p.add_argument("--vgg_weights_path", default=None)
    p.add_argument("--pretrain_epochs", type=int, default=d.pretrain_epochs)
    p.add_argument("--multi_scale", type=int, nargs="*", default=None,
                   help="train one net on mixed factors, e.g. "
                        "--multi_scale 2 3 4 (VDSR/DRCN)")
    p.add_argument("--steps_per_dispatch", type=int, default=d.steps_per_dispatch,
                   help=">1 fuses K steps + sampling into one program")
    p.add_argument("--vdsr_clip_theta", type=float, default=d.vdsr_clip_theta,
                   help="VDSR adjustable-clip θ (0.05 measured best; 0.4 "
                        "= literal reference recipe)")
    p.add_argument("--random_scale_mode", default=d.random_scale_mode,
                   choices=["item", "batch", "matrix"],
                   help="sampler scale draw: 'item' = per sample via "
                        "lax.switch (reference; vmap computes all six "
                        "resize branches), 'batch' = once per batch "
                        "(1.37x faster stepping for small models, "
                        "behavioral delta), 'matrix' = per sample via "
                        "selected resize matrices (item semantics, one "
                        "batched matmul instead of six branches)")
    p.add_argument("--preshuffle_loss", nargs="?", const="last",
                   default=False, choices=["last", "full"],
                   help="train tail-shuffle models (ESPCN/EDSR) in "
                        "pre-shuffle space: exact same loss and grads. "
                        "'last' (the bare-flag value) folds only the "
                        "final shuffle (+2.9%% ESPCN, 0.74x EDSR — "
                        "PERF.md round-4 A/B); 'full' folds EVERY tail "
                        "conv through EVERY shuffle (EDSR) so all tail "
                        "convs run at LR resolution with zero d2s "
                        "copies in fwd+bwd (PERF.md round-5 A/B)")
    p.add_argument("--self_ensemble", action="store_true",
                   help="geometric self-ensemble at eval: average the 8 "
                        "D4 flip/rotation variants (the EDSR paper's '+' "
                        "mode; ~8x eval cost for ~+0.1-0.3 dB)")
    p.add_argument("--fast_eval", action="store_true",
                   help="on-device PSNR, no image transfer / panels")
    p.add_argument("--export", action="store_true",
                   help="after train/eval, write an AOT StableHLO serving "
                        "artifact (<run_dir>/<Model>_x<r>.hloart — sr/export.py)")
    p.add_argument("--export_torch", action="store_true",
                   help="after train/eval, also write a reference-format "
                        "torch checkpoint (<run_dir>/<Model>_param.pkl — "
                        "sr/utils/torch_interop.py)")
    a = p.parse_args(argv)

    spec = get_spec(a.model_name)
    cfg = SRConfig(
        model_name=a.model_name,
        num_channels=(a.num_channels if a.num_channels is not None
                      else spec.default_channels),
        scale_factor=a.scale_factor, crop_size=a.crop_size,
        num_epochs=a.num_epochs, save_epochs=a.save_epochs,
        batch_size=a.batch_size, test_batch_size=a.test_batch_size,
        lr=a.lr, data_dir=a.data_dir, save_dir=a.save_dir,
        train_dataset=a.train_dataset, test_dataset=a.test_dataset,
        num_threads=a.num_threads, dtype=a.dtype,
        steps_per_epoch=a.steps_per_epoch, seed=a.seed,
        mesh_shape=tuple(a.mesh) if a.mesh else (),
        mesh_axes=("data", "spatial")[: len(a.mesh)] if a.mesh else ("data",),
        resume=not a.no_resume, use_pallas=a.use_pallas,
        vgg_weights_path=a.vgg_weights_path,
        pretrain_epochs=a.pretrain_epochs,
        scale_factors=tuple(a.multi_scale) if a.multi_scale else (),
        steps_per_dispatch=a.steps_per_dispatch,
        random_scale_mode=a.random_scale_mode,
        vdsr_clip_theta=a.vdsr_clip_theta,
        preshuffle_loss=a.preshuffle_loss,
    )
    return check_args(cfg), (a.eval_only, a.fast_eval, a.export,
                             a.export_torch, a.self_ensemble)


def check_args(cfg: SRConfig) -> SRConfig:
    """Validate + create save dirs. (reference: main.py:check_args)"""
    if cfg.crop_size % cfg.scale_factor:
        raise SystemExit("--crop_size must be divisible by --scale_factor")
    if cfg.num_epochs < 1 or cfg.batch_size < 1:
        raise SystemExit("--num_epochs and --batch_size must be ≥1")
    run_dir = os.path.join(cfg.save_dir, f"{cfg.model_name}_x{cfg.scale_factor}")
    os.makedirs(run_dir, exist_ok=True)
    return cfg


def _run_dir(cfg: SRConfig) -> str:
    return os.path.join(cfg.save_dir, f"{cfg.model_name}_x{cfg.scale_factor}")


def build_pipeline(cfg: SRConfig, spec) -> PatchPipeline:
    color = "rgb" if cfg.num_channels == 3 else "ycbcr"
    train_set = get_training_set(cfg.data_dir, cfg.train_dataset, color)
    images = [train_set[i] for i in range(len(train_set))]
    return build_patch_pipeline(cfg, spec, images)


def run_eval(cfg: SRConfig, spec, predict_fn, out_dir: str, log=print,
             fast: bool = False) -> dict:
    color = "rgb" if cfg.num_channels == 3 else "ycbcr"
    test_set = get_test_set(cfg.data_dir, cfg.test_dataset, color)
    # real datasets have a distinct size per image — bucket them into one
    # static tiled shape (synthetic/procedural are fixed-size; direct
    # forward is fine). SyntheticDataset emits RGB regardless of the
    # model's color space; procedural honors `color` like FolderDataset.
    static = cfg.test_dataset.lower() not in ("synthetic", "procedural")
    res = evaluate(
        predict_fn, test_set, cfg.scale_factor, channels=cfg.num_channels,
        pre_upsample=spec.pre_upsample, dataset_name=cfg.test_dataset,
        keep_images=not fast, on_device_metrics=fast,
        color_space="rgb" if cfg.test_dataset.lower() == "synthetic" else color,
        static_shapes=static, model_name=cfg.model_name,
    )
    for r in res.images:
        if r.sr is None:
            continue  # fast mode: metrics only
        cs = "rgb" if cfg.test_dataset.lower() == "synthetic" else color
        save_img(r.sr, os.path.join(out_dir, "images", f"{r.name}_sr.png"), cs)
        plot_test_result(
            r.bicubic, r.sr, r.hr,
            os.path.join(out_dir, "panels", f"{r.name}.png"),
            psnr_bicubic=r.psnr_bicubic, psnr_sr=r.psnr_sr, color_space=cs,
        )
    s = res.summary()
    log(f"[eval] {cfg.test_dataset} x{cfg.scale_factor}: "
        f"SR {s['psnr_sr']:.2f} dB vs bicubic {s['psnr_bicubic']:.2f} dB")
    return s


def _make_sample_hook(cfg: SRConfig, run_dir: str, predict, batch):
    """Per-epoch sample render (reference: each wrapper's train loop saves
    a test-image reconstruction every epoch)."""
    import jax.numpy as jnp

    spec = get_spec(cfg.model_name)
    x = batch[spec.input_key()][:1]

    def hook(state, epoch):
        if (epoch + 1) % cfg.save_epochs:
            return
        sr = np.asarray(predict(state, x), np.float32)[0]
        img = np.clip(np.round(sr * 255.0), 0, 255).astype(np.uint8)
        cs = "rgb" if cfg.num_channels == 3 else "ycbcr"
        if img.shape[-1] == 1:
            cs = "rgb"
            img = np.repeat(img, 3, axis=-1)
        save_img(img, os.path.join(run_dir, "samples", f"epoch_{epoch + 1:04d}.png"), cs)

    return hook


def main(argv=None) -> int:
    # multi-host bootstrap (no-op unless SR_COORDINATOR/SR_MULTIHOST is
    # set — see sr/parallel/multihost.py); must run before backend init
    from sr.parallel.multihost import initialize_multihost

    if initialize_multihost():
        import jax as _jax

        print(f"[multihost] process {_jax.process_index()}/"
              f"{_jax.process_count()}")

    cfg, (eval_only, fast_eval, export, export_torch,
          self_ensemble) = parse_args(argv)
    spec = get_spec(cfg.model_name)
    run_dir = _run_dir(cfg)
    jsonl = JSONLLogger(os.path.join(run_dir, "metrics.jsonl"))
    tb = TensorBoardLogger(os.path.join(run_dir, "logs"))
    print(f"model={cfg.model_name} scale=x{cfg.scale_factor} "
          f"devices={jax.device_count()} dtype={cfg.dtype}")

    ck = Checkpointer(os.path.join(run_dir, "ckpt"),
                      keep=cfg.keep_checkpoints, meta=run_meta(cfg),
                      resume=cfg.resume)

    if spec.is_gan:
        from sr.train.gan import GANTrainer

        tr = GANTrainer(cfg)
        pipe = build_pipeline(cfg, spec)
        rng = jax.random.key(cfg.seed)
        b0 = pipe(rng)
        g_state, d_state = tr.init_states(rng, b0["lr"][:1], b0["hr"][:1])
        ck_d = Checkpointer(os.path.join(run_dir, "ckpt_d"),
                            keep=cfg.keep_checkpoints, meta=run_meta(cfg),
                            resume=cfg.resume)
        restored = None
        if cfg.resume:
            restored = ck.restore(g_state)
            if restored is not None:
                g_state = restored
                print(f"[resume] generator step {int(g_state.step)}")
                restored_d = ck_d.restore(d_state)
                if restored_d is not None:
                    d_state = restored_d
        if eval_only and restored is None:
            raise SystemExit(
                "--eval_only needs a trained checkpoint in "
                f"{os.path.join(run_dir, 'ckpt')}"
            )
        predict = lambda x: tr.predict(g_state, x)  # noqa: E731
        if not eval_only:
            g_state, d_state = tr.fit(
                g_state, d_state, pipe, checkpointer=ck,
                d_checkpointer=ck_d, log_cb=jsonl,
                epoch_hook=_make_sample_hook(
                    cfg, run_dir, lambda s, x: tr.predict(s, x), b0
                ),
            )
            predict = lambda x: tr.predict(g_state, x)  # noqa: E731
        final_params = (g_state.params, g_state.batch_stats)
    else:
        from sr.train.trainer import Trainer

        tr = Trainer(cfg)
        pipe = build_pipeline(cfg, spec)
        rng = jax.random.key(cfg.seed)
        b0 = pipe(rng)
        state = tr.init_state(rng, b0[spec.input_key()][:1])
        print(f"params: {tr.num_params(state):,}")
        restored = None
        if cfg.resume:
            restored = ck.restore(state)
            if restored is not None:
                state = restored
                print(f"[resume] step {int(state.step)}")
        if eval_only and restored is None:
            raise SystemExit(
                "--eval_only needs a trained checkpoint in "
                f"{os.path.join(run_dir, 'ckpt')} (refusing to evaluate "
                "randomly-initialized weights; reference wrappers refuse too)"
            )
        predict_jit = tr.make_predict_fn()
        predict = lambda x: predict_jit(state.params, state.batch_stats, x)  # noqa: E731
        if not eval_only:
            epoch_losses = []

            def log_cb(rec):
                jsonl(rec)
                if tb.active:
                    tb.scalar("loss", rec["loss"], rec["step"])
                if "loss" in rec:
                    epoch_losses.append(rec["loss"])

            state = tr.fit(
                state, pipe, checkpointer=ck, log_cb=log_cb,
                eval_hook=_make_sample_hook(
                    cfg, run_dir,
                    lambda s, x: predict_jit(s.params, s.batch_stats, x), b0,
                ),
            )
            predict = lambda x: predict_jit(state.params, state.batch_stats, x)  # noqa: E731
            if epoch_losses:
                plot_loss(epoch_losses, os.path.join(run_dir, "loss.png"),
                          title=f"{cfg.model_name} x{cfg.scale_factor}")
        final_params = (state.params, state.batch_stats)

    # npz written from the LIVE state so it always matches the weights
    # just trained/evaluated (a resumed run's checkpoint can be newer
    # than a previously written npz — the export must not ship stale
    # params)
    save_params(os.path.join(run_dir, f"{cfg.model_name}_params.npz"),
                *final_params)
    if self_ensemble:
        from sr.eval.ensemble import make_self_ensemble_predict

        # wraps BELOW run_eval's static tiling: per-tile D4 ensemble is
        # exact for the ensemble operator (sr/eval/ensemble.py docstring)
        predict = make_self_ensemble_predict(predict)
        print("[eval] geometric self-ensemble enabled (8 forwards per image)")
    summary = run_eval(cfg, spec, predict, run_dir, log=print, fast=fast_eval)
    if self_ensemble:
        summary["self_ensemble"] = True
    jsonl({"event": "eval", **summary})
    if export:
        print(f"[export] {export_artifact(cfg, spec, run_dir)}")
    if export_torch:
        from sr.utils.torch_interop import export_reference_checkpoint

        variables = {"params": final_params[0]}
        if final_params[1] is not None:
            variables["batch_stats"] = final_params[1]
        pkl = os.path.join(run_dir, f"{cfg.model_name}_param.pkl")
        print("[export_torch] " + export_reference_checkpoint(
            cfg.model_name, spec.make_model(cfg), variables, pkl))
    jsonl.close()
    ck.close()
    return 0


def export_artifact(cfg: SRConfig, spec, run_dir: str) -> str:
    """Write the trained run's AOT serving artifact (sr/export.py).

    Input spatial size matches the training convention: crop_size for
    pre-upsample models (they receive the bicubic-upscaled image),
    crop_size/scale for raw-LR models. Batch is symbolic.
    """
    from sr.export import export_predict, save_artifact

    params_path = os.path.join(run_dir, f"{cfg.model_name}_params.npz")
    if not os.path.exists(params_path):
        raise SystemExit(f"--export needs trained params at {params_path}")
    size = (cfg.crop_size if spec.pre_upsample
            else cfg.crop_size // cfg.scale_factor)
    exp = export_predict(
        cfg.model_name, params_path, cfg.scale_factor, cfg.num_channels,
        cfg.dtype, lr_size=size,
        # forward every arch-affecting knob — res_scale is param-free and
        # would otherwise silently change the exported function
        cfg_overrides={"num_resblocks": cfg.num_resblocks,
                       "base_filter": cfg.base_filter,
                       "res_scale": cfg.res_scale,
                       "num_recursions": cfg.num_recursions},
    )
    out = os.path.join(run_dir, f"{cfg.model_name}_x{cfg.scale_factor}.hloart")
    save_artifact(out, exp)
    return out


if __name__ == "__main__":
    sys.exit(main())
