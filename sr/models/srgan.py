"""SRGAN — Ledig et al., CVPR 2017. (reference: srgan.py:SRGAN)

Adversarial recipe over the SRResNet generator (sr/models/srresnet.py:Net)
and the VGG-style discriminator. Training is two-phase
(reference: srgan.py:SRGAN.train):

  phase 1 — generator-only MSE pre-training (``cfg.pretrain_epochs``);
  phase 2 — per step: D update (BCE real/fake, fake detached), then G
  update with MSE content + w_vgg·VGG-feature perceptual MSE +
  w_adv·BCE(D(G(lr)), 1).

The two-optimizer step lives in sr/train/gan.py; this module only wires
the spec. The generator's content loss here (used for pre-training and as
the content term) is plain MSE.
"""

from __future__ import annotations

import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.models.srresnet import Discriminator, Net
from sr.train.losses import mse_loss
from sr.train.optim import adam


def _make(cfg):
    return Net(
        cfg.num_channels, cfg.base_filter, cfg.num_resblocks,
        cfg.scale_factor, jnp.dtype(cfg.dtype),
    )


def _make_d(cfg):
    return Discriminator(cfg.base_filter, dtype=jnp.dtype(cfg.dtype))


def _loss(out, batch, ctx):
    # content-only term; adversarial/perceptual terms are composed by the
    # GAN trainer (sr/train/gan.py)
    return mse_loss(out, batch["hr"]), {}


SPEC = register(
    ModelSpec(
        name="SRGAN",
        make_model=_make,
        loss=_loss,
        make_tx=lambda cfg: adam(cfg.effective_lr),
        pre_upsample=False,
        default_channels=3,
        default_lr=1e-4,
        is_gan=True,
        has_batchnorm=True,
        make_discriminator=_make_d,
    )
)
