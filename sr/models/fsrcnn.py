"""FSRCNN — Dong et al., ECCV 2016. (reference: fsrcnn.py:Net)

Hourglass on the RAW LR input: feature 5×5 (d=56, PReLU) → shrink 1×1
(s=12) → m=4 mapping convs 3×3 → expand 1×1 (d) → transposed conv 9×9
stride r. MSE loss, Adam.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock, DeconvBlock
from sr.train.losses import mse_loss
from sr.train.optim import adam


class Net(nn.Module):
    num_channels: int = 1
    d: int = 56
    s: int = 12
    m: int = 4
    scale_factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.d, 5, act="prelu", dtype=self.dtype)(x, train)
        x = ConvBlock(self.s, 1, act="prelu", dtype=self.dtype)(x, train)
        for _ in range(self.m):
            x = ConvBlock(self.s, 3, act="prelu", dtype=self.dtype)(x, train)
        x = ConvBlock(self.d, 1, act="prelu", dtype=self.dtype)(x, train)
        x = DeconvBlock(
            self.num_channels, 9, self.scale_factor, act=None,
            kernel_init="normal_001", dtype=self.dtype,
        )(x, train)
        return x


def _make(cfg):
    return Net(
        num_channels=cfg.num_channels,
        scale_factor=cfg.scale_factor,
        dtype=jnp.dtype(cfg.dtype),
    )


def _loss(out, batch, ctx):
    return mse_loss(out, batch["hr"]), {}


def _label_lr_groups(params):
    """'deconv' for every top-level subtree that contains a transposed
    conv, 'base' otherwise. Structural (inspects the actual param tree
    for flax's ``nn.ConvTranspose`` auto-name) rather than keyed on our
    own block class name, so renaming DeconvBlock cannot silently move
    the tail into the wrong LR group (tests/test_optim.py locks this)."""
    from flax.traverse_util import flatten_dict

    def has_transpose(subtree):
        if not isinstance(subtree, dict):
            return False
        return any(
            any(part.startswith("ConvTranspose") for part in path)
            for path in flatten_dict(subtree)
        )

    return {
        k: ("deconv" if has_transpose(v) else "base")
        for k, v in params.items()
    }


def _make_tx(cfg):
    # the deconv tail trains at 0.1× the base LR (Dong et al. ECCV'16
    # §4.2; reference: fsrcnn.py optimizer param groups)
    import optax

    base = cfg.effective_lr
    return optax.multi_transform(
        {"base": adam(base), "deconv": adam(base * 0.1)}, _label_lr_groups
    )


SPEC = register(
    ModelSpec(
        name="FSRCNN",
        make_model=_make,
        loss=_loss,
        make_tx=_make_tx,
        pre_upsample=False,
        default_channels=1,
        default_lr=1e-3,
    )
)
