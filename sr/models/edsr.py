"""EDSR — Lim et al., CVPRW 2017. (reference: edsr.py:Net)

BN-free residual blocks: head conv → B resblocks (conv-ReLU-conv, residual
scaling for wide variants) → tail conv + global skip → pixel-shuffle
upsampler (×2 stages; ×3 single stage) → output conv. L1 loss, Adam 1e-4
halved on schedule. RGB (3-channel) by default.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock, PSBlock, ResnetBlock
from sr.train.losses import l1_loss
from sr.train.optim import adam_with_halving


class Net(nn.Module):
    num_channels: int = 3
    base_filter: int = 64
    num_resblocks: int = 16
    scale_factor: int = 4
    res_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filter
        x = ConvBlock(f, 3, act=None, dtype=self.dtype)(x, train)
        skip = x
        for _ in range(self.num_resblocks):
            x = ResnetBlock(
                f, 3, act="relu", norm=None, res_scale=self.res_scale,
                dtype=self.dtype,
            )(x, train)
        x = ConvBlock(f, 3, act=None, dtype=self.dtype)(x, train)
        x = x + skip
        r = self.scale_factor
        if r in (2, 3):
            x = PSBlock(f, r, act=None, dtype=self.dtype)(x, train)
        elif r == 4:
            x = PSBlock(f, 2, act=None, dtype=self.dtype)(x, train)
            x = PSBlock(f, 2, act=None, dtype=self.dtype)(x, train)
        elif r == 8:
            for _ in range(3):
                x = PSBlock(f, 2, act=None, dtype=self.dtype)(x, train)
        else:
            raise ValueError(f"unsupported scale {r}")
        return ConvBlock(self.num_channels, 3, act=None, dtype=self.dtype)(x, train)


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.num_resblocks,
        cfg.scale_factor, cfg.res_scale, jnp.dtype(cfg.dtype),
    )


def _loss(out, batch, ctx):
    return l1_loss(out, batch["hr"]), {}


SPEC = register(
    ModelSpec(
        name="EDSR",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: adam_with_halving(
            cfg.effective_lr, cfg.steps_per_epoch, halve_epochs=50
        ),
        pre_upsample=False,
        default_channels=3,
        default_lr=1e-4,
    )
)
