"""ONE shared trainer for the whole zoo.

The reference duplicates a ~200-line train/test/checkpoint loop in every
model file (SURVEY §1 'no shared trainer'). Here a single
:class:`Trainer` consumes a ``ModelSpec`` (sr/models/registry.py) and runs
any non-GAN model: jitted mesh-aware train step (params replicated, batch
sharded over the ``data`` axis, XLA GSPMD all-reduces grads over ICI),
JSONL metrics, full-state checkpointing with resume, and periodic eval.

GAN training (SRGAN) extends this in sr/train/gan.py.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from sr.models.registry import ModelSpec, get_spec
from sr.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
)
from sr.train.state import SRTrainState
from sr.utils.config import SRConfig


def _apply(model, params, batch_stats, x, train: bool):
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    if train and batch_stats is not None:
        out, mut = model.apply(variables, x, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]
    out = model.apply(variables, x, train=train)
    return out, batch_stats


class Trainer:
    """Shared train/eval driver for one ModelSpec."""

    def __init__(
        self,
        cfg: SRConfig,
        spec: ModelSpec | None = None,
        mesh=None,
        logger=None,
    ):
        self.cfg = cfg
        self.spec = spec or get_spec(cfg.model_name)
        self.model = self.spec.make_model(cfg)
        self.tx = self.spec.make_tx(cfg)
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        self.logger = logger
        self._batch_sh = batch_sharding(self.mesh)
        self._repl_sh = replicated_sharding(self.mesh)
        self._step_fn = None
        self._predict_fn = None
        self._in_key = self.spec.input_key()
        # pre-shuffle loss mode (cfg.preshuffle_loss): tail-shuffle
        # models train in pre-shuffle space — the final depth_to_space
        # layout copy drops out of fwd+bwd, and EDSR's narrow out_conv
        # runs folded with r²× the MXU lanes. Exact: the fold is exact
        # and the losses are permutation-invariant elementwise means
        # (tests/test_train_fold.py locks step equivalence). Measured
        # A/B (PERF.md): +2.9% ESPCN, 0.74x EDSR — opt-in, default off.
        self._preshuffle = None
        want_full = cfg.preshuffle_loss == "full"
        has_any = (self.spec.preshuffle_train is not None
                   or self.spec.preshuffle_train_full is not None)
        if cfg.preshuffle_loss and not has_any:
            # silent fallback to the normal loss would record a fake
            # 1.0x in any preshuffle A/B — refuse instead
            raise ValueError(
                f"{self.spec.name}: preshuffle_loss requested but the "
                "spec defines no pre-shuffle fold (only tail-shuffle "
                "models support it — ESPCN 'last', EDSR 'last'/'full')")
        if cfg.preshuffle_loss and has_any:
            # the pre-shuffle loss path returns batch_stats unchanged
            # (loss_fn's new_bs = batch_stats): a BN-carrying model would
            # silently freeze its running stats — enforce the invariant
            # in code, not just the comment (ADVICE r4)
            if self.spec.has_batchnorm:
                raise ValueError(
                    f"{self.spec.name}: preshuffle_loss does not support "
                    "batchnorm models (batch stats would not advance)")
            if want_full and self.spec.preshuffle_train_full is None:
                # an A/B that silently ran the 'last' fold would record
                # a fake 1.0x 'full' result — refuse instead
                raise ValueError(
                    f"{self.spec.name}: preshuffle_loss='full' requested "
                    "but the spec defines no full-tail fold "
                    "(preshuffle_train_full); use preshuffle_loss='last'")
            if want_full and self.spec.preshuffle_train_full is not None:
                # (apply_fn, target_fn): full-tail fold, target is the
                # model's own space_to_depth chain
                self._preshuffle = self.spec.preshuffle_train_full(
                    self.model)
            elif self.spec.preshuffle_train is not None:
                from sr.kernels.depth_to_space import space_to_depth

                apply_pre, r_last = self.spec.preshuffle_train(self.model)
                self._preshuffle = (
                    apply_pre, lambda hr: space_to_depth(hr, r_last))

    # -- state ------------------------------------------------------------

    def init_state(self, rng: jax.Array, sample_input: jax.Array) -> SRTrainState:
        params_rng, state_rng = jax.random.split(rng)
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            params_rng, sample_input, train=False
        )
        state = SRTrainState.create(
            apply_fn=self.model.apply,
            params=variables["params"],
            tx=self.tx,
            batch_stats=variables.get("batch_stats"),
            rng=state_rng,
        )
        return replicate(state, self.mesh)

    def num_params(self, state: SRTrainState) -> int:
        return sum(int(p.size) for p in jax.tree.leaves(state.params))

    # -- the jitted step ----------------------------------------------------

    def _step_core(self, state: SRTrainState, batch) -> tuple[SRTrainState, dict]:
        """One un-jitted train step (shared by the single-step jit and the
        scan-of-K-steps program)."""
        spec, cfg, model = self.spec, self.cfg, self.model
        in_key = self._in_key
        batch_sh = self._batch_sh

        preshuffle = self._preshuffle

        def loss_fn(params, batch_stats, batch, step):
            if preshuffle is not None:
                apply_pre, target_fn = preshuffle
                out = apply_pre({"params": params}, batch[in_key], train=True)
                new_bs = batch_stats  # eligible models carry no BN
                # hr moves to pre-shuffle space instead (no grad side:
                # layout ops XLA can fuse into the loss elementwise)
                batch = {**batch, "hr": target_fn(batch["hr"])}
            else:
                out, new_bs = _apply(
                    model, params, batch_stats, batch[in_key], True
                )
            ctx = spec.schedule(cfg, step)
            loss, metrics = spec.loss(out, batch, ctx)
            return loss, (metrics, new_bs)

        # reshard wherever the batch comes from (pipeline output is
        # single-device); GSPMD then all-reduces grads over ICI
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sh), batch
        )
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, state.step)
        new_state = state.apply_gradients(grads=grads, batch_stats=new_bs)
        return new_state, {"loss": loss, **metrics}

    def _build_step(self) -> Callable:
        return jax.jit(
            self._step_core,
            in_shardings=(self._repl_sh, None),
            out_shardings=(self._repl_sh, self._repl_sh),
            donate_argnums=(0,),
        )

    def make_multi_step(self, pipeline, k: int) -> Callable:
        """ONE jitted program running K train steps, sampling each batch
        on device from the pipeline's HBM-resident corpus inside the
        program (``lax.scan``). Zero host work per step — the fully
        realized on-device pipeline (BASELINE.json north star), and the
        dispatch-latency amortization lever on relay-attached TPUs.

        Returns ``fn(state, rng, bank) -> (state, rng, metrics)`` where
        metrics are averaged over the K steps.
        """
        sample = pipeline.sample_fn

        def run(state, rng, bank):
            def body(carry, _):
                state, rng = carry
                rng, sub = jax.random.split(rng)
                batch = sample(bank, sub)
                state, metrics = self._step_core(state, batch)
                return (state, rng), metrics

            (state, rng), metrics = jax.lax.scan(
                body, (state, rng), None, length=k
            )
            return state, rng, jax.tree.map(jnp.mean, metrics)

        return jax.jit(
            run,
            in_shardings=(self._repl_sh, None, None),
            out_shardings=(self._repl_sh, None, self._repl_sh),
            donate_argnums=(0,),
        )

    def train_step(self, state: SRTrainState, batch) -> tuple[SRTrainState, dict]:
        if self._step_fn is None:
            self._step_fn = self._build_step()
        return self._step_fn(state, batch)

    # -- inference ----------------------------------------------------------

    def predict(self, state: SRTrainState, x: jax.Array) -> jax.Array:
        if self._predict_fn is None:
            self._predict_fn = self.make_predict_fn()
        return self._predict_fn(state.params, state.batch_stats, x)

    def make_predict_fn(self) -> Callable:
        """Jitted eval-mode forward: (params, batch_stats, x) → sr."""
        model = self.model

        @jax.jit
        def fn(params, batch_stats, x):
            out, _ = _apply(model, params, batch_stats, x, False)
            return out

        return fn

    # -- the fit loop ---------------------------------------------------------

    def fit(
        self,
        state: SRTrainState,
        pipeline,
        num_epochs: int | None = None,
        steps_per_epoch: int | None = None,
        checkpointer=None,
        eval_hook: Callable[[SRTrainState, int], dict] | None = None,
        log_cb: Callable[[dict], None] | None = None,
    ) -> SRTrainState:
        """Epoch loop: sample → step → log → checkpoint → eval.

        ``pipeline`` is a callable key→batch (sr/data/pipeline.py). The
        sampler and the train step are both device-side; the host only
        splits PRNG keys and reads back scalar metrics at log points.
        """
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        spe = steps_per_epoch or cfg.steps_per_epoch
        rng = state.rng  # resumes continue the stream (rng saved per epoch)
        t0 = time.time()

        k = max(1, min(cfg.steps_per_dispatch, spe))
        multi = None
        if k > 1 and hasattr(pipeline, "sample_fn"):
            multi = self.make_multi_step(pipeline, k)

        from sr.train.loop import dispatch_epoch

        # Resume arithmetic: a restored state may land mid-epoch (step not
        # a multiple of spe — e.g. a manual save). The first resumed epoch
        # then runs only the REMAINING steps so the final step count is
        # exactly num_epochs*spe. The batch stream is reproduced exactly
        # because both the single-step and the scan-k paths consume one
        # rng split per step (tests/test_trainer.py resume tests).
        start_step = int(state.step)
        for epoch in range(start_step // spe, num_epochs):
            done = start_step % spe if epoch == start_step // spe else 0
            losses = []

            def _log(metrics):
                losses.append(float(metrics["loss"]))
                if log_cb:
                    log_cb(
                        {
                            "epoch": epoch,
                            "step": int(state.step),
                            "wall_s": round(time.time() - t0, 2),
                            **{k_: float(v) for k_, v in metrics.items()},
                        }
                    )

            def do_single(sub):
                nonlocal state
                state, metrics = self.train_step(state, pipeline(sub))
                return metrics

            def do_multi(rng):
                nonlocal state
                # strip the key from the donated state: it aliases the
                # separately-passed rng buffer (f(donate(a), a))
                state, rng, metrics = multi(
                    state.replace(rng=None), rng, pipeline.bank
                )
                return rng, metrics

            rng = dispatch_epoch(
                spe - done, k, cfg.log_every, rng, do_single,
                do_multi if multi is not None else None, _log,
            )
            avg = sum(losses) / max(len(losses), 1)
            print(f"epoch {epoch + 1}/{num_epochs} avg_loss={avg:.6f}")
            # thread the CURRENT rng into the state before it can be
            # checkpointed — otherwise a resumed run replays the batch
            # stream from epoch 0 (exact-resume guarantee)
            state = state.replace(rng=rng)
            if checkpointer is not None and (
                (epoch + 1) % cfg.save_epochs == 0 or epoch + 1 == num_epochs
            ):
                checkpointer.save(state)
            if eval_hook is not None:
                eval_hook(state, epoch)
        return state
