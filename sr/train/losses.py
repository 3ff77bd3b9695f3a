"""Loss functions for the SR zoo.

Covers the reference collection's loss menu: MSE (SRCNN/VDSR/ESPCN/FSRCNN/
SRResNet), L1 (EDSR), Charbonnier (LapSRN — reference: lapsrn.py local
L1_Charbonnier_loss class), DRCN's recursive supervision
(reference: drcn.py loss = α·Σ per-recursion + (1−α)·final), and the GAN
losses (reference: srgan.py — BCE adversarial + VGG-feature perceptual).

All functions are pure and jittable; reductions are means over all elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def l1_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def charbonnier_loss(
    pred: jax.Array, target: jax.Array, eps: float = 1e-3
) -> jax.Array:
    """sqrt(diff² + eps²), a differentiable L1 (Lai et al., CVPR'17)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.sqrt(d * d + eps * eps))


def recursive_supervision_loss(
    recursions: jax.Array,
    final: jax.Array,
    target: jax.Array,
    alpha: jax.Array | float,
) -> tuple[jax.Array, dict]:
    """DRCN loss: α·mean_d MSE(y_d, t) + (1−α)·MSE(final, t).

    ``recursions`` is (D, B, H, W, C) — the per-recursion reconstructions;
    ``final`` the ensemble (recursion-weighted) output; ``alpha`` anneals
    from 1 → 0 over training (Kim et al., CVPR'16).
    """
    rec = jax.vmap(lambda y: mse_loss(y, target))(recursions)
    loss1 = jnp.mean(rec)
    loss2 = mse_loss(final, target)
    alpha = jnp.asarray(alpha, jnp.float32)
    loss = alpha * loss1 + (1.0 - alpha) * loss2
    return loss, {"loss_rec": loss1, "loss_final": loss2}


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Numerically-stable BCE. The reference's D ends in sigmoid + BCELoss
    (reference: srgan.py:Discriminator); we keep D's head as logits and fold
    the sigmoid here — same objective, stable on TPU bf16."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
