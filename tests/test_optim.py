"""Optimizer-recipe unit tests: schedules + VDSR adjustable clipping."""

import jax.numpy as jnp
import numpy as np

from sr.train.optim import (
    adjustable_grad_clip,
    step_decay_schedule,
    vdsr_sgd,
)


def test_step_decay_schedule():
    s = step_decay_schedule(0.1, steps_per_epoch=10, decay_epochs=20, factor=0.1)
    assert float(s(0)) == np.float32(0.1)
    assert float(s(199)) == np.float32(0.1)
    assert abs(float(s(200)) - 0.01) < 1e-9
    assert abs(float(s(400)) - 0.001) < 1e-9


def test_step_decay_disabled():
    s = step_decay_schedule(0.5, 10, 0, 0.1)
    assert float(s(1000)) == 0.5


def test_adjustable_clip_limits_follow_lr():
    sched = step_decay_schedule(0.1, 1, 2, 0.1)  # decays every 2 steps
    tx = adjustable_grad_clip(theta=0.4, lr_schedule=sched)
    params = {"w": jnp.zeros(3)}
    state = tx.init(params)
    big = {"w": jnp.array([100.0, -100.0, 1.0])}
    norm = np.linalg.norm([100.0, -100.0, 1.0])
    # step 0: lr=0.1 → global-norm limit 4
    u, state = tx.update(big, state)
    np.testing.assert_allclose(
        np.asarray(u["w"]), np.array([100.0, -100.0, 1.0]) * 4.0 / norm,
        rtol=1e-5,
    )
    u, state = tx.update(big, state)
    # step 2: lr=0.01 → limit 40
    u, state = tx.update(big, state)
    np.testing.assert_allclose(
        np.asarray(u["w"]), np.array([100.0, -100.0, 1.0]) * 40.0 / norm,
        rtol=1e-5,
    )
    # small grads pass through unscaled
    small = {"w": jnp.array([0.1, 0.1, 0.1])}
    u, state = tx.update(small, state)
    np.testing.assert_allclose(np.asarray(u["w"]), [0.1, 0.1, 0.1], rtol=1e-6)


def test_vdsr_chain_runs():
    tx = vdsr_sgd(0.1, steps_per_epoch=2)
    params = {"w": jnp.ones(4)}
    state = tx.init(params)
    grads = {"w": jnp.full(4, 0.5)}
    updates, state = tx.update(grads, state, params)
    assert updates["w"].shape == (4,)
    # sgd descent direction (updates are negative for positive grads)
    assert float(updates["w"][0]) < 0


def test_adam_step_halving_is_step_keyed():
    """EDSR's lr interval is in minibatch STEPS (paper: 2e5), decoupled
    from steps_per_epoch (PARITY delta 12 — the epoch-keyed variant
    froze 150k-step runs at small spe)."""
    from sr.train.optim import adam_with_step_halving

    tx = adam_with_step_halving(1e-4, 1000)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    # optax.adam exposes the schedule via the injected hyperparams of
    # scale_by_learning_rate; probe it by applying a unit gradient at
    # a forced step count instead of poking internals
    g = {"w": jnp.array([1.0, 0.0])}
    # step counts live in ScaleByAdamState.count; fast-forward by
    # rebuilding the count leaf
    import optax

    def lr_at(count):
        s = step_decay_schedule(1e-4, 1, 1000, 0.5)
        return float(s(count))

    np.testing.assert_allclose(lr_at(0), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(lr_at(999), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(lr_at(1000), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(lr_at(2500), 2.5e-5, rtol=1e-6)
    # and the real tx at least produces finite, lr-scaled updates
    u, state = tx.update(g, state, params)
    assert np.isfinite(np.asarray(u["w"])).all()
    del optax


def test_adam_step_halving_zero_disables_decay():
    """halve_steps <= 0 must mean NO decay (step_decay_schedule's
    convention), not halve-every-step: max(halve_steps, 1) silently
    turned lr_halve_steps=0 into lr·0.5^step — frozen after ~50 steps,
    the exact failure class the step-keyed schedule was shipped to fix
    (round-4 review finding)."""
    from sr.train.optim import adam_with_step_halving

    tx = adam_with_step_halving(1e-4, 0)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    g = {"w": jnp.array([1.0, 0.0])}
    u = None
    for _ in range(60):
        u, state = tx.update(g, state, params)
    # after 60 constant unit gradients Adam's update is ~lr-sized; under
    # the halve-every-step bug it would be ~1e-4 * 0.5^59 ≈ 2e-22
    assert abs(float(u["w"][0])) > 1e-5
