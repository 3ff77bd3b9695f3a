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
from sr.train.optim import adam_with_step_halving


_STAGES = {2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}


class Net(nn.Module):
    num_channels: int = 3
    base_filter: int = 64
    num_resblocks: int = 16
    scale_factor: int = 4
    res_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.scale_factor not in _STAGES:
            raise ValueError(f"unsupported scale {self.scale_factor}")
        f = self.base_filter
        self.head = ConvBlock(f, 3, act=None, dtype=self.dtype)
        self.blocks = [
            ResnetBlock(f, 3, act="relu", norm=None,
                        res_scale=self.res_scale, dtype=self.dtype)
            for _ in range(self.num_resblocks)
        ]
        self.body_conv = ConvBlock(f, 3, act=None, dtype=self.dtype)
        self.upsample = [
            PSBlock(f, s, act=None, dtype=self.dtype)
            for s in _STAGES[self.scale_factor]
        ]
        self.out_conv = ConvBlock(self.num_channels, 3, act=None, dtype=self.dtype)

    def body(self, x, train: bool = False):
        """Nonlinear trunk: head conv → resblocks → conv + global skip."""
        x = self.head(x, train)
        skip = x
        for blk in self.blocks:
            x = blk(x, train)
        x = self.body_conv(x, train)
        return x + skip

    def tail(self, x, train: bool = False):
        """Upsampling tail — entirely AFFINE (PS convs and the output
        conv have no activations), which makes it collapsible into one
        conv + one depth_to_space (sr/kernels/fused_tail.py)."""
        for up in self.upsample:
            x = up(x, train)
        return self.out_conv(x, train)

    def __call__(self, x, train: bool = False):
        return self.tail(self.body(x, train), train)

    def forward_preshuffle(self, x, train: bool = False):
        """Body + upsample stages with the LAST stage's shuffle omitted:
        returns the pre-shuffle activation that feeds [d2s → out_conv].
        The trainer's pre-shuffle loss mode folds out_conv through the
        final shuffle on top of this (sr/kernels/shuffle_fold.py), so
        the full-resolution d2s layout copy never runs in fwd or bwd
        (~14% of the train step — PERF.md backward attribution). Exact:
        EDSR's PSBlocks are act/norm-free."""
        x = self.body(x, train)
        for up in self.upsample[:-1]:
            x = up(x, train)
        return self.upsample[-1](x, train, shuffle=False)


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.num_resblocks,
        cfg.scale_factor, cfg.res_scale, jnp.dtype(cfg.dtype),
    )


def _loss(out, batch, ctx):
    return l1_loss(out, batch["hr"]), {}


def _preshuffle_train(model):
    """Pre-shuffle training forward: body+stages (last shuffle omitted)
    then the out_conv FOLDED through the final shuffle, applied in-graph
    from the live params (differentiable scatter — grads land in the
    original out_conv basis; Adam/checkpoints unchanged). Output is the
    pre-shuffle image: loss runs against space_to_depth(hr, r_last)
    (L1 is permutation-invariant), so the full-res d2s and the narrow
    3-channel out_conv gradient both disappear from the step."""
    import jax

    from sr.kernels.shuffle_fold import fold_shuffle_conv_kernel_jnp

    r_last = _STAGES[model.scale_factor][-1]

    def apply_fn(variables, x, train=True):
        h = model.apply(variables, x, train=train,
                        method="forward_preshuffle")
        oc = variables["params"]["out_conv"]["Conv_0"]
        wf, dmin = fold_shuffle_conv_kernel_jnp(
            oc["kernel"].astype(h.dtype), r_last
        )
        t = wf.shape[0]
        pad_lo, pad_hi = -dmin, t - 1 + dmin
        z = jax.lax.conv_general_dilated(
            h, wf, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bf = jnp.repeat(oc["bias"], r_last * r_last)
        return z + bf.astype(z.dtype)

    return apply_fn, r_last


SPEC = register(
    ModelSpec(
        name="EDSR",
        make_model=_make,
        loss=_loss,
        # paper: lr halved every 2e5 minibatch updates (cfg knob). The
        # old 50-epoch interval froze long runs at small spe — measured
        # on the procedural benchmark: 150k-step EDSR gained only
        # +0.36 dB over 20k with lr decayed 2^15 by the end
        make_tx=lambda cfg: adam_with_step_halving(
            cfg.effective_lr, cfg.lr_halve_steps
        ),
        pre_upsample=False,
        default_channels=3,
        default_lr=1e-4,
        preshuffle_train=_preshuffle_train,
    )
)
