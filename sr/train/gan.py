"""SRGAN adversarial trainer: two optimizers, one jitted step.

The reference's most complex loop (reference: srgan.py:SRGAN.train,
SURVEY §3.3): a generator MSE pre-training phase, then per batch a D
update (BCE real/fake, fake detached) followed by a G update
(MSE content + w_vgg·VGG-feature MSE + w_adv·adversarial BCE), two Adam
optimizers, D strictly before G.

TPU-first: the WHOLE adversarial step (D forward/backward/update + G
forward/backward/update + both BN-stat updates) is ONE jitted function —
no per-phase host round-trips; batches shard over the data axis like the
shared trainer.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

from sr.models.registry import ModelSpec, get_spec
from sr.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
)
from sr.train.losses import bce_with_logits, mse_loss
from sr.train.state import SRTrainState
from sr.train.trainer import _apply
from sr.train.vgg import load_vgg
from sr.utils.config import SRConfig


class GANTrainer:
    """Two-phase SRGAN training (pretrain → adversarial)."""

    def __init__(self, cfg: SRConfig, spec: ModelSpec | None = None, mesh=None):
        self.cfg = cfg
        self.spec = spec or get_spec(cfg.model_name)
        assert self.spec.is_gan, "GANTrainer requires a GAN spec"
        self.g_model = self.spec.make_model(cfg)
        self.d_model = self.spec.make_discriminator(cfg)
        self.g_tx = self.spec.make_tx(cfg)
        self.d_tx = self.spec.make_tx(cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        self._repl = replicated_sharding(self.mesh)
        self._bsh = batch_sharding(self.mesh)
        self.vgg_model, self.vgg_params = load_vgg(
            cfg.vgg_weights_path, output_layer=cfg.vgg_output_layer
        )
        self._pre_fn = None
        self._adv_fn = None
        self._predict = None

    # -- init --------------------------------------------------------------

    def init_states(
        self, rng: jax.Array, lr_sample: jax.Array, hr_sample: jax.Array
    ) -> tuple[SRTrainState, SRTrainState]:
        rg, rd, rs = jax.random.split(rng, 3)
        gv = jax.jit(self.g_model.init, static_argnames=("train",))(
            rg, lr_sample, train=False
        )
        dv = jax.jit(self.d_model.init, static_argnames=("train",))(
            rd, hr_sample, train=False
        )
        g_state = SRTrainState.create(
            apply_fn=self.g_model.apply, params=gv["params"], tx=self.g_tx,
            batch_stats=gv.get("batch_stats"), rng=rs,
        )
        d_state = SRTrainState.create(
            apply_fn=self.d_model.apply, params=dv["params"], tx=self.d_tx,
            batch_stats=dv.get("batch_stats"), rng=None,
        )
        return (
            replicate(g_state, self.mesh),
            replicate(d_state, self.mesh),
        )

    # -- steps -------------------------------------------------------------

    def _shard(self, batch):
        bsh = self._bsh
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, bsh), batch
        )

    def _pretrain_core(self, g_state: SRTrainState, batch):
        g_model = self.g_model

        def loss_fn(params, bs, batch):
            sr, new_bs = _apply(g_model, params, bs, batch["lr"], True)
            return mse_loss(sr, batch["hr"]), new_bs

        batch = self._shard(batch)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            g_state.params, g_state.batch_stats, batch
        )
        g_state = g_state.apply_gradients(grads=grads, batch_stats=new_bs)
        return g_state, {"g_content_loss": loss}

    def _build_pretrain(self) -> Callable:
        return jax.jit(
            self._pretrain_core, in_shardings=(self._repl, None),
            out_shardings=(self._repl, self._repl), donate_argnums=(0,),
        )

    def _adversarial_core(self, g_state: SRTrainState, d_state: SRTrainState, batch):
        g_model, d_model = self.g_model, self.d_model
        vgg_model, vgg_params = self.vgg_model, self.vgg_params
        w_vgg = self.cfg.vgg_loss_weight
        w_adv = self.cfg.adv_loss_weight

        def d_loss_fn(d_params, d_bs, fake, real):
            real_logits, d_bs = _apply(d_model, d_params, d_bs, real, True)
            fake_logits, d_bs = _apply(d_model, d_params, d_bs, fake, True)
            loss = bce_with_logits(
                real_logits, jnp.ones_like(real_logits)
            ) + bce_with_logits(fake_logits, jnp.zeros_like(fake_logits))
            return loss, d_bs

        def g_loss_fn(g_params, g_bs, d_state, batch):
            sr, g_bs = _apply(g_model, g_params, g_bs, batch["lr"], True)
            content = mse_loss(sr, batch["hr"])
            loss = content
            metrics = {"g_content_loss": content}
            if vgg_model is not None:
                feat_sr = vgg_model.apply({"params": vgg_params}, sr)
                feat_hr = vgg_model.apply({"params": vgg_params}, batch["hr"])
                perceptual = mse_loss(feat_sr, feat_hr)
                loss = loss + w_vgg * perceptual
                metrics["g_vgg_loss"] = perceptual
            # adversarial term against the JUST-updated D (reference order).
            # D's BN mode follows cfg.adv_d_train_mode — default False =
            # EVAL mode (running stats), the measured-better choice
            # (PARITY.md delta 10: 25.35 vs 20.84 dB); True reproduces the
            # reference's literal train-mode module state. Mutated
            # batch_stats are discarded either way — only D's own update
            # advances its running stats
            logits, _ = _apply(
                d_model, d_state.params, d_state.batch_stats, sr,
                self.cfg.adv_d_train_mode,
            )
            adv = bce_with_logits(logits, jnp.ones_like(logits))
            loss = loss + w_adv * adv
            metrics["g_adv_loss"] = adv
            return loss, (metrics, g_bs)

        def step(g_state, d_state, batch):
            batch = self._shard(batch)
            # ---- D update: fake is the TRAIN-mode G forward, detached
            # (reference: srgan.py uses G(lr).detach() with the model in
            # train mode) — D must classify the same fake distribution
            # the G update optimizes, i.e. batch-stat BN output
            fake, _ = _apply(
                g_model, g_state.params, g_state.batch_stats, batch["lr"], True
            )
            fake = jax.lax.stop_gradient(fake)
            # the detached forward's mutated batch_stats are DISCARDED:
            # the reference computes G(lr) once per iteration (one BN
            # running-stat update), while keeping this g_bs and then
            # applying the G-update forward's stats advanced the stats
            # twice per step on the same batch — doubled effective BN
            # momentum, drifting eval-mode outputs from parity (round-4
            # review finding). fake's VALUES are batch-stat normalized
            # and unaffected.
            (d_loss, d_bs), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(d_state.params, d_state.batch_stats, fake, batch["hr"])
            d_state = d_state.apply_gradients(grads=d_grads, batch_stats=d_bs)
            # ---- G update ----
            (g_loss, (metrics, g_bs)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(g_state.params, g_state.batch_stats, d_state, batch)
            g_state = g_state.apply_gradients(grads=g_grads, batch_stats=g_bs)
            metrics = {"d_loss": d_loss, "g_loss": g_loss, **metrics}
            return g_state, d_state, metrics

        return step(g_state, d_state, batch)

    def _build_adversarial(self) -> Callable:
        return jax.jit(
            self._adversarial_core,
            in_shardings=(self._repl, self._repl, None),
            out_shardings=(self._repl, self._repl, self._repl),
            donate_argnums=(0, 1),
        )

    def make_multi_step(self, pipeline, k: int, phase: str) -> Callable:
        """Scan-fused K-step program for one GAN phase (see
        Trainer.make_multi_step): samples each batch on device from the
        pipeline's HBM corpus inside the jit.

        pretrain:    fn(g_state, rng, bank) -> (g_state, rng, metrics)
        adversarial: fn(g_state, d_state, rng, bank)
                       -> (g_state, d_state, rng, metrics)
        """
        sample = pipeline.sample_fn

        if phase == "pretrain":
            inner = self._pretrain_core

            def run(g_state, rng, bank):
                def body(carry, _):
                    g, rng = carry
                    rng, sub = jax.random.split(rng)
                    g, m = inner(g, sample(bank, sub))
                    return (g, rng), m

                (g_state, rng), ms = jax.lax.scan(
                    body, (g_state, rng), None, length=k
                )
                return g_state, rng, jax.tree.map(jnp.mean, ms)

            return jax.jit(
                run, in_shardings=(self._repl, None, None),
                out_shardings=(self._repl, None, self._repl),
                donate_argnums=(0,),
            )

        inner = self._adversarial_core

        def run(g_state, d_state, rng, bank):
            def body(carry, _):
                g, d, rng = carry
                rng, sub = jax.random.split(rng)
                g, d, m = inner(g, d, sample(bank, sub))
                return (g, d, rng), m

            (g_state, d_state, rng), ms = jax.lax.scan(
                body, (g_state, d_state, rng), None, length=k
            )
            return g_state, d_state, rng, jax.tree.map(jnp.mean, ms)

        return jax.jit(
            run, in_shardings=(self._repl, self._repl, None, None),
            out_shardings=(self._repl, self._repl, None, self._repl),
            donate_argnums=(0, 1),
        )

    def pretrain_step(self, g_state, batch):
        if self._pre_fn is None:
            self._pre_fn = self._build_pretrain()
        return self._pre_fn(g_state, batch)

    def adversarial_step(self, g_state, d_state, batch):
        if self._adv_fn is None:
            self._adv_fn = self._build_adversarial()
        return self._adv_fn(g_state, d_state, batch)

    def predict(self, g_state: SRTrainState, x: jax.Array) -> jax.Array:
        if self._predict is None:
            g_model = self.g_model

            @jax.jit
            def fn(params, bs, x):
                out, _ = _apply(g_model, params, bs, x, False)
                return out

            self._predict = fn
        return self._predict(g_state.params, g_state.batch_stats, x)

    # -- fit ---------------------------------------------------------------

    def fit(
        self,
        g_state: SRTrainState,
        d_state: SRTrainState,
        pipeline,
        num_epochs: int | None = None,
        steps_per_epoch: int | None = None,
        pretrain_epochs: int | None = None,
        checkpointer=None,
        d_checkpointer=None,
        log_cb=None,
        epoch_hook=None,
    ) -> tuple[SRTrainState, SRTrainState]:
        cfg = self.cfg
        num_epochs = num_epochs if num_epochs is not None else cfg.num_epochs
        spe = steps_per_epoch or cfg.steps_per_epoch
        pre = (
            pretrain_epochs if pretrain_epochs is not None else cfg.pretrain_epochs
        )
        rng = g_state.rng
        t0 = time.time()
        k = max(1, min(cfg.steps_per_dispatch, spe))
        multi = {}
        if k > 1 and hasattr(pipeline, "sample_fn"):
            multi = {
                "pretrain": self.make_multi_step(pipeline, k, "pretrain"),
                "adversarial": self.make_multi_step(pipeline, k, "adversarial"),
            }
        # resume support: G's step counts pretrain + adversarial steps.
        # A mid-epoch restore runs only the REMAINING steps of its epoch
        # (same arithmetic as Trainer.fit)
        start_step = int(g_state.step)
        for epoch in range(start_step // spe, num_epochs):
            done = start_step % spe if epoch == start_step // spe else 0
            phase = "pretrain" if epoch < pre else "adversarial"
            agg = {}

            def _log(metrics):
                nonlocal agg
                agg = {k_: float(v) for k_, v in metrics.items()}
                if log_cb:
                    log_cb(
                        {
                            "epoch": epoch, "phase": phase,
                            "step": int(g_state.step),
                            "wall_s": round(time.time() - t0, 2), **agg,
                        }
                    )

            def do_single(sub, phase=phase):
                nonlocal g_state, d_state
                batch = pipeline(sub)
                if phase == "pretrain":
                    g_state, metrics = self.pretrain_step(g_state, batch)
                else:
                    g_state, d_state, metrics = self.adversarial_step(
                        g_state, d_state, batch
                    )
                return metrics

            def do_multi(rng, phase=phase):
                nonlocal g_state, d_state
                # strip rng from the donated state (aliases the rng arg)
                if phase == "pretrain":
                    g_state, rng, metrics = multi[phase](
                        g_state.replace(rng=None), rng, pipeline.bank
                    )
                else:
                    g_state, d_state, rng, metrics = multi[phase](
                        g_state.replace(rng=None), d_state, rng,
                        pipeline.bank,
                    )
                return rng, metrics

            from sr.train.loop import dispatch_epoch

            rng = dispatch_epoch(
                spe - done, k, cfg.log_every, rng, do_single,
                do_multi if multi else None, _log,
            )
            print(f"epoch {epoch + 1}/{num_epochs} [{phase}] {agg}")
            # current rng must reach any checkpoint (exact resume)
            g_state = g_state.replace(rng=rng)
            if checkpointer is not None and (
                (epoch + 1) % cfg.save_epochs == 0 or epoch + 1 == num_epochs
            ):
                checkpointer.save(g_state)
                if d_checkpointer is not None:
                    # key D snapshots by G's step (D has no steps during
                    # the pretrain phase)
                    d_checkpointer.save(d_state, step=int(g_state.step))
            if epoch_hook is not None:
                epoch_hook(g_state, epoch)
        return g_state, d_state
