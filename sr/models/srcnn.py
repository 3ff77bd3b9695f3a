"""SRCNN — Dong et al., TPAMI 2015. (reference: srcnn.py:Net)

3-layer 9-5-5 conv net (c→64→32→c) on a bicubic-pre-upsampled input,
MSE loss, Adam. The first deep-learning SR model; here the whole net is a
single fused XLA region (three NHWC convs + ReLUs).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock
from sr.train.losses import mse_loss
from sr.train.optim import adam


class Net(nn.Module):
    num_channels: int = 1
    base_filter: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.base_filter, 9, act="relu",
                      kernel_init="normal_001", dtype=self.dtype)(x, train)
        x = ConvBlock(self.base_filter // 2, 5, act="relu",
                      kernel_init="normal_001", dtype=self.dtype)(x, train)
        x = ConvBlock(self.num_channels, 5, act=None,
                      kernel_init="normal_001", dtype=self.dtype)(x, train)
        return x


def _make(cfg):
    return Net(cfg.num_channels, cfg.base_filter, jnp.dtype(cfg.dtype))


def _loss(out, batch, ctx):
    return mse_loss(out, batch["hr"]), {}


SPEC = register(
    ModelSpec(
        name="SRCNN",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: adam(cfg.effective_lr),
        pre_upsample=True,
        default_channels=1,
        default_lr=1e-3,
    )
)
