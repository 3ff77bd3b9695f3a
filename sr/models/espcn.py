"""ESPCN — Shi et al., CVPR 2016. (reference: espcn.py:Net)

Sub-pixel convolution net: 5-3-3 convs (c→64→32→c·r²) on the RAW LR input,
then pixel shuffle. The shuffle is sr.kernels.depth_to_space (Pallas-fusable
tail). MSE loss, Adam.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sr.kernels.depth_to_space import depth_to_space
from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock
from sr.train.losses import mse_loss
from sr.train.optim import adam


class Net(nn.Module):
    num_channels: int = 1
    base_filter: int = 64
    scale_factor: int = 4
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, preshuffle: bool = False):
        r = self.scale_factor
        x = ConvBlock(self.base_filter, 5, act="relu", dtype=self.dtype)(x, train)
        x = ConvBlock(self.base_filter // 2, 3, act="relu", dtype=self.dtype)(x, train)
        x = nn.Conv(
            self.num_channels * r * r, (3, 3), padding="SAME", dtype=self.dtype
        )(x)
        if preshuffle:
            # the shuffle is the net's LAST op — pre-shuffle training
            # (cfg.preshuffle_loss) computes the MSE against
            # space_to_depth(hr) instead and skips it in fwd AND bwd
            return x
        return depth_to_space(x, r, use_pallas=self.use_pallas)


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.scale_factor,
        cfg.use_pallas, jnp.dtype(cfg.dtype),
    )


def _loss(out, batch, ctx):
    return mse_loss(out, batch["hr"]), {}


def _preshuffle_train(model):
    """No fold needed: the shuffle is ESPCN's final op, so the
    pre-shuffle output is just the last conv's (B,h,w,c·r²) tensor."""

    def apply_fn(variables, x, train=True):
        return model.apply(variables, x, train=train, preshuffle=True)

    return apply_fn, model.scale_factor


SPEC = register(
    ModelSpec(
        name="ESPCN",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: adam(cfg.effective_lr),
        pre_upsample=False,
        default_channels=1,
        default_lr=1e-3,
        preshuffle_train=_preshuffle_train,
    )
)
