"""Reference-style per-model wrapper classes.

The reference exposes one wrapper class per model — ``SRCNN(args)``,
``VDSR(args)``, … — each with ``load_dataset() / train() / test() /
save_model() / load_model()`` (reference: every model file's wrapper,
e.g. srcnn.py:SRCNN). Users of the reference can keep that exact calling
convention; underneath, everything delegates to the shared TPU trainer,
the on-device pipeline, and the eval harness.

``args`` is anything attribute-shaped (an ``argparse.Namespace``, a
``SRConfig``, or a plain object) carrying the reference's flag names;
missing attributes fall back to the model's defaults.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

from sr.data.datasets import get_test_set, get_training_set
from sr.data.pipeline import PatchPipeline, build_patch_pipeline
from sr.eval.panels import plot_loss, plot_test_result, save_img
from sr.eval.runner import EvalResult, evaluate
from sr.models.registry import get_spec
from sr.train.trainer import Trainer
from sr.utils.checkpoint import (
    Checkpointer,
    load_params,
    run_meta,
    save_params,
)
from sr.utils.config import SRConfig


def _cfg_from_args(model_name: str, args: Any) -> SRConfig:
    spec = get_spec(model_name)
    cfg = SRConfig(model_name=model_name)
    kw = {}
    for f in (
        "num_channels scale_factor crop_size num_epochs save_epochs "
        "batch_size test_batch_size lr data_dir save_dir train_dataset "
        "test_dataset num_threads dtype steps_per_epoch seed"
    ).split():
        if hasattr(args, f) and getattr(args, f) is not None:
            kw[f] = getattr(args, f)
    kw.setdefault("num_channels", spec.default_channels)
    return cfg.replace(**kw)


class ModelWrapper:
    """Reference-shaped train/test driver around the shared trainer."""

    MODEL_NAME: str = ""

    def __init__(self, args: Any = None):
        args = args if args is not None else SRConfig(model_name=self.MODEL_NAME)
        self.cfg = (
            args if isinstance(args, SRConfig)
            else _cfg_from_args(self.MODEL_NAME, args)
        ).replace(model_name=self.MODEL_NAME)
        self.spec = get_spec(self.MODEL_NAME)
        self.trainer = Trainer(self.cfg)
        self.state = None
        self.train_losses: list[float] = []

    # -- reference API ---------------------------------------------------

    def load_dataset(self, dataset: str = "train"):
        """(reference: wrapper.load_dataset) → pipeline or test set."""
        cfg = self.cfg
        color = "rgb" if cfg.num_channels == 3 else "ycbcr"
        if dataset == "train":
            train_set = get_training_set(cfg.data_dir, cfg.train_dataset, color)
            images = [train_set[i] for i in range(len(train_set))]
            return build_patch_pipeline(cfg, self.spec, images)
        return get_test_set(cfg.data_dir, cfg.test_dataset, color)

    def train(self) -> list[float]:
        """Full training run (resume-capable). Returns per-log losses."""
        cfg = self.cfg
        pipe = self.load_dataset("train")
        rng = jax.random.key(cfg.seed)
        b0 = pipe(rng)
        state = self.trainer.init_state(rng, b0[self.spec.input_key()][:1])
        ck = Checkpointer(self._ckpt_dir(), keep=cfg.keep_checkpoints,
                          meta=run_meta(cfg),
                          resume=cfg.resume)
        if cfg.resume:
            restored = ck.restore(state)
            if restored is not None:
                state = restored
        losses = []

        def log_cb(rec):
            losses.append(rec["loss"])

        state = self.trainer.fit(state, pipe, checkpointer=ck, log_cb=log_cb)
        self.state = state
        self.train_losses = losses
        self.save_model()
        plot_loss(losses, os.path.join(self._run_dir(), "loss.png"),
                  title=f"{self.MODEL_NAME} x{cfg.scale_factor}")
        ck.close()
        return losses

    def test(self) -> EvalResult:
        """PSNR eval + rendered panels. Requires a trained/loaded model.

        (reference: wrapper.test — refuses to run without a checkpoint.)
        """
        if self.state is None and not self.load_model():
            raise RuntimeError(
                f"no trained parameters for {self.MODEL_NAME}; run train() "
                f"or place {self._params_path()}"
            )
        cfg = self.cfg
        test_set = self.load_dataset("test")
        predict_jit = self.trainer.make_predict_fn()
        params, bs = self._params
        color = "rgb" if cfg.num_channels == 3 else "ycbcr"
        cs = "rgb" if cfg.test_dataset.lower() == "synthetic" else color
        res = evaluate(
            lambda x: predict_jit(params, bs, x), test_set, cfg.scale_factor,
            channels=cfg.num_channels, pre_upsample=self.spec.pre_upsample,
            dataset_name=cfg.test_dataset, keep_images=True, color_space=cs,
            static_shapes=cfg.test_dataset.lower() != "synthetic",
            model_name=cfg.model_name,
        )
        out = self._run_dir()
        for r in res.images:
            save_img(r.sr, os.path.join(out, "images", f"{r.name}_sr.png"), cs)
            plot_test_result(
                r.bicubic, r.sr, r.hr,
                os.path.join(out, "panels", f"{r.name}.png"),
                psnr_bicubic=r.psnr_bicubic, psnr_sr=r.psnr_sr, color_space=cs,
            )
        return res

    def save_model(self) -> str:
        """(reference: wrapper.save_model → <Model>_param.pkl)"""
        assert self.state is not None, "nothing to save"
        path = self._params_path()
        save_params(path, self.state.params, self.state.batch_stats)
        return path

    def load_model(self) -> bool:
        """(reference: wrapper.load_model → bool)

        Looks for this framework's ``<Model>_params.npz`` first, then for
        a reference-style ``<Model>_param.pkl`` (``torch.save(state_dict)``
        — reference: wrapper.save_model) and imports it weight-for-weight
        (sr/utils/torch_interop.py:import_state_dict), so checkpoints
        trained with the reference collection load directly.
        """
        path = self._params_path()
        pkl = os.path.join(self._run_dir(), f"{self.MODEL_NAME}_param.pkl")
        if not os.path.exists(path) and not os.path.exists(pkl):
            return False
        rng = jax.random.key(self.cfg.seed)
        size = self.cfg.crop_size
        if not self.spec.pre_upsample:
            size //= self.cfg.scale_factor
        x = np.zeros((1, max(size, 8), max(size, 8), self.cfg.num_channels),
                     np.float32)
        state = self.trainer.init_state(rng, x)
        if os.path.exists(path):
            params, bs = load_params(path)
        else:
            from sr.utils.torch_interop import load_reference_checkpoint

            variables = {"params": state.params}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
            new = load_reference_checkpoint(
                self.MODEL_NAME, self.trainer.model, variables, pkl)
            params, bs = new["params"], new.get("batch_stats")
        self.state = state.replace(params=params, batch_stats=bs)
        return True

    # -- internals ---------------------------------------------------------

    @property
    def _params(self):
        return self.state.params, self.state.batch_stats

    def _run_dir(self) -> str:
        d = os.path.join(
            self.cfg.save_dir, f"{self.MODEL_NAME}_x{self.cfg.scale_factor}"
        )
        os.makedirs(d, exist_ok=True)
        return d

    def _ckpt_dir(self) -> str:
        return os.path.join(self._run_dir(), "ckpt")

    def _params_path(self) -> str:
        return os.path.join(self._run_dir(), f"{self.MODEL_NAME}_params.npz")


class SRCNN(ModelWrapper):
    MODEL_NAME = "SRCNN"


class VDSR(ModelWrapper):
    MODEL_NAME = "VDSR"


class DRCN(ModelWrapper):
    MODEL_NAME = "DRCN"


class ESPCN(ModelWrapper):
    MODEL_NAME = "ESPCN"


class FSRCNN(ModelWrapper):
    MODEL_NAME = "FSRCNN"


class EDSR(ModelWrapper):
    MODEL_NAME = "EDSR"


class SRResNet(ModelWrapper):
    MODEL_NAME = "SRResNet"


class LapSRN(ModelWrapper):
    MODEL_NAME = "LapSRN"


class SRGAN(ModelWrapper):
    """GAN wrapper: train() runs the two-phase GANTrainer."""

    MODEL_NAME = "SRGAN"

    def __init__(self, args: Any = None):
        super().__init__(args)
        from sr.train.gan import GANTrainer

        self.gan = GANTrainer(self.cfg)
        # predictions go through the generator
        self.trainer.model = self.gan.g_model

    def train(self) -> list[float]:
        cfg = self.cfg
        pipe = self.load_dataset("train")
        rng = jax.random.key(cfg.seed)
        b0 = pipe(rng)
        g, d = self.gan.init_states(rng, b0["lr"][:1], b0["hr"][:1])
        ck = Checkpointer(self._ckpt_dir(), keep=cfg.keep_checkpoints,
                          meta=run_meta(cfg),
                          resume=cfg.resume)
        # mirror sr/main.py: D gets its own checkpointer so a resumed run
        # continues against the trained discriminator, not a fresh one
        ck_d = Checkpointer(self._ckpt_dir() + "_d",
                            keep=cfg.keep_checkpoints, meta=run_meta(cfg),
                            resume=cfg.resume)
        if cfg.resume:
            restored = ck.restore(g)
            if restored is not None:
                g = restored
                restored_d = ck_d.restore(d)
                if restored_d is not None:
                    d = restored_d
        losses = []
        g, d = self.gan.fit(
            g, d, pipe, checkpointer=ck, d_checkpointer=ck_d,
            log_cb=lambda rec: losses.append(rec.get("g_loss", rec.get("g_content_loss"))),
        )
        self.state = g
        self.save_model()
        ck.close()
        ck_d.close()
        return losses
