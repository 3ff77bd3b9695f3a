"""Loss closed-form tests (SURVEY §4.1: Charbonnier, recursive supervision)."""

import numpy as np
import jax.numpy as jnp

from sr.train.losses import (
    bce_with_logits,
    charbonnier_loss,
    l1_loss,
    mse_loss,
    recursive_supervision_loss,
)


def test_mse_l1_closed_form():
    a = jnp.zeros((2, 2))
    b = jnp.full((2, 2), 3.0)
    assert float(mse_loss(a, b)) == 9.0
    assert float(l1_loss(a, b)) == 3.0


def test_charbonnier_closed_form():
    a = jnp.zeros((4,))
    b = jnp.full((4,), 3.0)
    eps = 1e-3
    expected = np.sqrt(9.0 + eps * eps)
    assert abs(float(charbonnier_loss(a, b, eps)) - expected) < 1e-7
    # eps floor when diff = 0
    assert abs(float(charbonnier_loss(a, a, eps)) - eps) < 1e-9


def test_recursive_supervision_alpha_endpoints():
    t = jnp.zeros((1, 2, 2, 1))
    ys = jnp.stack([jnp.full_like(t, 1.0), jnp.full_like(t, 2.0)])  # MSE 1, 4
    final = jnp.full_like(t, 3.0)  # MSE 9
    l1, aux = recursive_supervision_loss(ys, final, t, alpha=1.0)
    assert abs(float(l1) - 2.5) < 1e-6  # mean(1, 4)
    l0, _ = recursive_supervision_loss(ys, final, t, alpha=0.0)
    assert abs(float(l0) - 9.0) < 1e-6
    lh, _ = recursive_supervision_loss(ys, final, t, alpha=0.5)
    assert abs(float(lh) - (0.5 * 2.5 + 0.5 * 9.0)) < 1e-6
    assert set(aux) == {"loss_rec", "loss_final"}


def test_bce_with_logits_matches_numpy(rng):
    logits = rng.standard_normal((16,)).astype(np.float32)
    labels = (rng.uniform(size=16) > 0.5).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-logits))
    expected = -np.mean(labels * np.log(p) + (1 - labels) * np.log(1 - p))
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(got - expected) < 1e-5
