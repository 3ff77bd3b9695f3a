"""DRCN — Kim et al., CVPR 2016. (reference: drcn.py:Net)

Deeply-recursive net on a bicubic-pre-upsampled input:
embedding (2 convs) → ONE weight-shared recursive conv applied D=16 times →
shared reconstruction net applied to every recursion state, each prediction
residual-added to the input → learnable recursion-ensemble weights combine
the D predictions into the final output.

Loss = α·mean_d MSE(y_d) + (1−α)·MSE(final) with α annealed 1→0
(sr/train/losses.py:recursive_supervision_loss); the ensemble weights are
trained through the final-output term. The recursion is a ``lax.scan`` over
the shared conv — one compiled body regardless of depth.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock
from sr.train.losses import recursive_supervision_loss
from sr.train.optim import adam


class _RecStep(nn.Module):
    """One recursion of the shared inference conv (scanned body)."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, _):
        h = nn.relu(
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        )
        return h, h  # (carry, stacked per-recursion state)


class Net(nn.Module):
    num_channels: int = 1
    base_filter: int = 64  # paper uses 256; collection-scale default 64
    num_recursions: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filter
        inp = x
        # embedding net
        h = ConvBlock(f, 3, act="relu", dtype=self.dtype)(x, train)
        h = ConvBlock(f, 3, act="relu", dtype=self.dtype)(h, train)

        # inference net: ONE shared conv applied D times as a lax.scan —
        # params broadcast across iterations (weight sharing), one
        # compiled body regardless of depth
        scan = nn.scan(
            _RecStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            length=self.num_recursions,
        )
        _, states = scan(f, self.dtype)(h, None)  # (D, B, H, W, C)

        # reconstruction net (shared across recursion outputs): fold the
        # recursion axis into the batch so the convs run once on a
        # D×-larger batch instead of D separate dispatches
        recon1 = ConvBlock(f, 3, act="relu", dtype=self.dtype)
        recon2 = nn.Conv(self.num_channels, (3, 3), padding="SAME", dtype=self.dtype)
        d, b, hh, ww, cc = states.shape
        flat = states.reshape(d * b, hh, ww, cc)
        preds = recon2(recon1(flat, train))
        # per-recursion predictions (residual to the pre-upsampled input)
        ys = preds.reshape(d, b, *preds.shape[1:]) + inp[None]  # (D,B,H,W,C)

        # learnable ensemble weights, normalized to sum 1
        w = self.param(
            "recursion_weights",
            lambda k: jnp.full((self.num_recursions,), 1.0 / self.num_recursions),
        ).astype(ys.dtype)
        w = w / jnp.sum(w)
        final = jnp.einsum("d,dbhwc->bhwc", w, ys)
        if train:
            return final, ys
        return final


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.num_recursions, jnp.dtype(cfg.dtype)
    )


def _loss(out, batch, ctx):
    final, ys = out
    return recursive_supervision_loss(ys, final, batch["hr"], ctx["alpha"])


def _schedule(cfg, step):
    # α anneals linearly 1 → 0 over the run (recursive supervision fades
    # in favor of the ensembled final output)
    total = jnp.maximum(cfg.num_epochs * cfg.steps_per_epoch, 1)
    return {"alpha": jnp.clip(1.0 - step / total, 0.0, 1.0)}


def _make_tx(cfg):
    # DRCN's loss carries an L2 weight-decay term β≈1e-4 (Kim et al.
    # CVPR'16 §4.1; reference: drcn.py loss). add_decayed_weights BEFORE
    # adam injects wd·θ into the gradients — i.e. loss-level L2 through
    # Adam's preconditioner, exactly the paper's objective (NOT decoupled
    # AdamW decay, which would chain AFTER adam)
    import optax

    return optax.chain(
        optax.add_decayed_weights(1e-4), adam(cfg.effective_lr)
    )


SPEC = register(
    ModelSpec(
        name="DRCN",
        make_model=_make,
        loss=_loss,
        make_tx=_make_tx,
        schedule=_schedule,
        pre_upsample=True,
        default_channels=1,
        default_lr=1e-4,
    )
)
