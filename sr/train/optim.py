"""Optimizer chains for the zoo's training recipes.

The reference hand-rolls an optimizer per model file (Adam for the
SRCNN-era nets, SGD+momentum with step decay and adjustable gradient
clipping for VDSR — reference: vdsr.py:VDSR.train). Here each recipe is an
optax chain built from these helpers; schedules are expressed in steps
(epochs × cfg.steps_per_epoch).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def step_decay_schedule(
    base_lr: float, steps_per_epoch: int, decay_epochs: int, factor: float
) -> optax.Schedule:
    """lr · factor^(epoch // decay_epochs) — VDSR-style step decay."""
    if decay_epochs <= 0:
        return optax.constant_schedule(base_lr)

    boundary = decay_epochs * steps_per_epoch

    def sched(count):
        return base_lr * jnp.power(factor, count // boundary)

    return sched


class AdjClipState(NamedTuple):
    count: jax.Array


def adjustable_grad_clip(theta: float, lr_schedule: optax.Schedule):
    """VDSR's adjustable gradient clipping: global grad norm ≤ θ/γ(step).

    (Kim et al. CVPR'16 §3.4; reference: vdsr.py — torch
    ``clip_grad_norm(params, clip/lr)`` — bounds the GLOBAL norm by
    θ/current-lr so the effective update norm stays ≤ θ as the LR
    decays. Elementwise clipping at the same limit is far too permissive
    and lets lr=0.1 diverge at init.)
    """

    def init_fn(params):
        del params
        return AdjClipState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        lim = theta / lr_schedule(state.count)
        g_norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, lim / jnp.maximum(g_norm, 1e-12))
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, AdjClipState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def adam(lr, b1: float = 0.9, b2: float = 0.999) -> optax.GradientTransformation:
    return optax.adam(lr, b1=b1, b2=b2)


def vdsr_sgd(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs: int = 20,
    factor: float = 0.1,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
    clip_theta: float = 0.4,
) -> optax.GradientTransformation:
    sched = step_decay_schedule(base_lr, steps_per_epoch, decay_epochs, factor)
    return optax.chain(
        adjustable_grad_clip(clip_theta, sched),
        optax.add_decayed_weights(weight_decay),
        optax.sgd(sched, momentum=momentum),
    )


def adam_with_step_halving(
    base_lr: float, halve_steps: int
) -> optax.GradientTransformation:
    """EDSR recipe, paper units: Adam with lr halved every
    ``halve_steps`` minibatch updates (Lim et al.: 2e5). ``<= 0``
    disables the decay (constant lr), matching step_decay_schedule's
    convention — NOT halve-every-step. (An epoch-keyed variant used to
    live here; it tied the interval to steps_per_epoch and over-decayed
    long runs at small spe — PARITY delta; SRConfig.lr_halve_steps
    documents the measured failure.)"""
    sched = step_decay_schedule(base_lr, 1, halve_steps, 0.5)
    return optax.adam(sched)
