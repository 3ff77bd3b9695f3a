"""VDSR — Kim et al., CVPR 2016. (reference: vdsr.py:Net)

20 layers of 3×3/64 convs with global residual learning on a bicubic-
pre-upsampled input (multi-scale capable: one net serves ×2/×3/×4).
Recipe: SGD momentum 0.9, weight decay 1e-4, lr 0.1 decayed ×0.1 every
20 epochs, adjustable gradient clipping θ/γ (sr/train/optim.py).
θ defaults to the measured-better 0.05 instead of the reference's 0.4 —
a 7-arm A/B isolated the clip threshold (not the lr schedule) as VDSR's
quality cap: 20.59 dB (θ=0.4) vs 21.65 (θ=0.05) on the identical run;
θ=4.0 diverges (results_vdsr_ablation*.json; PARITY.md delta 11).
Set ``vdsr_clip_theta=0.4`` for literal reference behavior.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock
from sr.train.losses import mse_loss
from sr.train.optim import vdsr_sgd


class Net(nn.Module):
    num_channels: int = 1
    base_filter: int = 64
    num_layers: int = 20
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = ConvBlock(self.base_filter, 3, act="relu",
                      kernel_init="kaiming", use_bias=False, dtype=self.dtype)(x, train)
        for _ in range(self.num_layers - 2):
            x = ConvBlock(self.base_filter, 3, act="relu",
                          kernel_init="kaiming", use_bias=False, dtype=self.dtype)(x, train)
        x = ConvBlock(self.num_channels, 3, act=None,
                      kernel_init="kaiming", use_bias=False, dtype=self.dtype)(x, train)
        return x + inp  # global residual learning


def _make(cfg):
    return Net(cfg.num_channels, cfg.base_filter, dtype=jnp.dtype(cfg.dtype))


def _loss(out, batch, ctx):
    return mse_loss(out, batch["hr"]), {}


SPEC = register(
    ModelSpec(
        name="VDSR",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: vdsr_sgd(
            cfg.effective_lr, cfg.steps_per_epoch,
            clip_theta=getattr(cfg, "vdsr_clip_theta", 0.05),
        ),
        pre_upsample=True,
        default_channels=1,
        default_lr=0.1,
    )
)
