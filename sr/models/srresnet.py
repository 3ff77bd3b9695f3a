"""SRResNet (the SRGAN generator) + the SRGAN discriminator.

(reference: srgan.py:Net, srgan.py:Discriminator — Ledig et al., CVPR 2017.)

Generator: 9×9 conv + PReLU → 16 × (conv-BN-PReLU-conv-BN + skip) →
3×3 conv-BN + global skip → log2(r) sub-pixel ×2 stages (PSBlock + PReLU)
→ 9×9 output conv. RGB.

Discriminator: VGG-style 8-conv tower (64…512, alternating stride 2,
LeakyReLU 0.2, BN from the 2nd conv) → dense 1024 → LeakyReLU → dense 1.
The head returns LOGITS (the reference applies sigmoid in the module and
uses BCELoss; we fold the sigmoid into the loss — sr/train/losses.py:
bce_with_logits — which is the same objective, numerically stable).

Registered as model name 'SRResNet': the MSE-only (generator pre-training)
recipe. The adversarial recipe is model name 'SRGAN' (sr/models/srgan.py).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock, PSBlock, PReLU, ResnetBlock
from sr.train.losses import mse_loss
from sr.train.optim import adam


class Net(nn.Module):
    num_channels: int = 3
    base_filter: int = 64
    num_resblocks: int = 16
    scale_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.scale_factor & (self.scale_factor - 1) == 0, "power-of-2 scale"
        f = self.base_filter
        init = nn.initializers.normal(0.02)
        self.head = nn.Conv(f, (9, 9), padding=((4, 4), (4, 4)),
                            kernel_init=init, dtype=self.dtype)
        self.head_act = PReLU()
        self.blocks = [
            ResnetBlock(f, 3, act="prelu", norm="batch",
                        kernel_init="normal_002", dtype=self.dtype)
            for _ in range(self.num_resblocks)
        ]
        self.body_conv = nn.Conv(f, (3, 3), padding=((1, 1), (1, 1)),
                                 kernel_init=init, dtype=self.dtype)
        self.body_bn = nn.BatchNorm(use_running_average=None, momentum=0.9,
                                    dtype=self.dtype)
        self.upsample = [
            PSBlock(f, 2, act="prelu", kernel_init="normal_002",
                    dtype=self.dtype)
            for _ in range(int(math.log2(self.scale_factor)))
        ]
        self.out_conv = nn.Conv(self.num_channels, (9, 9),
                                padding=((4, 4), (4, 4)),
                                kernel_init=init, dtype=self.dtype)

    def body(self, x, train: bool = False):
        """Head + resblocks + conv-BN + global skip (all at LR res)."""
        x = self.head_act(self.head(x))
        skip = x
        for blk in self.blocks:
            x = blk(x, train)
        x = self.body_bn(self.body_conv(x), use_running_average=not train)
        return x + skip

    def tail(self, x, train: bool = False):
        """log2(r) × [conv → pixel-shuffle → PReLU] + 9×9 output conv.

        NOT affine (PReLUs between stages — unlike EDSR's tail), so the
        fused_tail collapse doesn't apply; the exact-equivalent fast path
        folds the output conv through the last shuffle instead
        (sr/kernels/shuffle_fold.py:make_folded_tail_predict)."""
        for up in self.upsample:
            x = up(x, train)
        return self.out_conv(x)

    def __call__(self, x, train: bool = False):
        return self.tail(self.body(x, train), train)


class Discriminator(nn.Module):
    base_filter: int = 64
    dense_features: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filter
        # (features, stride, use_bn)
        tower = [
            (f, 1, False), (f, 2, True),
            (f * 2, 1, True), (f * 2, 2, True),
            (f * 4, 1, True), (f * 4, 2, True),
            (f * 8, 1, True), (f * 8, 2, True),
        ]
        for feats, stride, bn in tower:
            x = ConvBlock(
                feats, 3, stride, act="lrelu", norm="batch" if bn else None,
                kernel_init="normal_002", dtype=self.dtype,
            )(x, train)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(self.dense_features, dtype=self.dtype)(x)
        x = nn.leaky_relu(x, negative_slope=0.2)
        return nn.Dense(1, dtype=self.dtype)(x)  # logits


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.num_resblocks,
        cfg.scale_factor, jnp.dtype(cfg.dtype),
    )


def _loss(out, batch, ctx):
    return mse_loss(out, batch["hr"]), {}


SPEC = register(
    ModelSpec(
        name="SRResNet",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: adam(cfg.effective_lr),
        pre_upsample=False,
        default_channels=3,
        default_lr=1e-4,
        has_batchnorm=True,
    )
)
