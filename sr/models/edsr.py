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


def _preshuffle_train_full(model):
    """FULL-tail pre-shuffle training forward (VERDICT r4 #4): every
    tail conv moved to LR resolution by repeatedly applying the exact
    fold identity ``conv(d2s(x, r), W) = d2s(conv(x, fold(W, r)), r)``
    (sr/kernels/shuffle_fold.py — border-exact, unlike the interior-only
    impulse-probe collapse of sr/kernels/fused_tail.py, so gradients are
    unchanged). For ×4 the tail becomes three 3×3 convs at LR
    (64→256→1024→48) with ZERO depth_to_space copies in fwd+bwd — the
    single-stage mode (``_preshuffle_train``) still paid the stage-1 d2s
    copy and ran a 12-channel folded conv (its measured 0.74× on EDSR —
    PERF.md round-4 pre-shuffle A/B names both causes). Output lives in
    fully pre-shuffled space; the loss target is the matching
    ``space_to_depth`` chain of ``hr`` (applied last-stage-first — the
    inverse of the dropped shuffle chain).

    Folded kernels are built in-graph from live params each step
    (differentiable scatters; grads land in the original basis, Adam
    state and checkpoints unchanged). All EDSR stage kernels are 3×3
    with torch SAME padding, which the fold maps back to 3×3 SAME — the
    symmetric-padding invariant is checked at trace time."""
    import jax

    from sr.kernels.depth_to_space import space_to_depth
    from sr.kernels.shuffle_fold import fold_shuffle_conv_kernel_jnp

    factors = _STAGES[model.scale_factor]

    def apply_fn(variables, x, train=True):
        h = model.apply(variables, x, train=train, method="body")
        p = variables["params"]
        convs = [p[f"upsample_{j}"]["Conv_0"] for j in range(len(factors))]
        convs.append(p["out_conv"]["Conv_0"])
        z = h
        for j, blk in enumerate(convs):
            w = blk["kernel"].astype(z.dtype)
            k = w.shape[0]
            pad_lo = pad_hi = k // 2
            rep = 1
            # fold conv j through every EARLIER stage's shuffle,
            # innermost (j-1) first — see derivation in the docstring
            for r_prev in reversed(factors[:j]):
                if pad_lo != pad_hi:
                    raise ValueError(
                        "full-tail fold needs symmetric intermediate "
                        f"padding, got ({pad_lo},{pad_hi})")
                w, dmin = fold_shuffle_conv_kernel_jnp(
                    w, r_prev, padding=pad_lo)
                t = w.shape[0]
                pad_lo, pad_hi = -dmin, t - 1 + dmin
                rep *= r_prev * r_prev
            z = jax.lax.conv_general_dilated(
                z, w, (1, 1), ((pad_lo, pad_hi), (pad_lo, pad_hi)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            z = z + jnp.repeat(blk["bias"], rep).astype(z.dtype)
        return z

    def target_fn(hr):
        # inverse of the dropped d2s chain: s2d by the LAST stage's
        # factor first, then backwards to stage 0
        z = hr
        for r in reversed(factors):
            z = space_to_depth(z, r)
        return z

    return apply_fn, target_fn


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
        preshuffle_train_full=_preshuffle_train_full,
    )
)
