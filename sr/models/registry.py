"""Model registry: name → (model factory, training recipe).

The reference dispatches on ``--model_name`` with an if/elif chain in
main.py and duplicates the train/test loop in every model file
(reference: main.py:main and each wrapper's ``train``). The rebuild inverts
that: ONE shared trainer (sr/train/trainer.py) consumes a ``ModelSpec``
that captures everything model-specific — network factory, loss, optimizer
chain, input convention, and schedule context.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable

import optax

_REGISTRY: dict[str, "ModelSpec"] = {}


@dataclass(frozen=True)
class ModelSpec:
    name: str
    make_model: Callable[[Any], Any]  # SRConfig -> flax Module
    loss: Callable[[Any, dict, dict], tuple]  # (out, batch, ctx) -> (loss, metrics)
    make_tx: Callable[[Any], optax.GradientTransformation]
    # schedule context computed per step, fed to loss (e.g. DRCN's alpha)
    schedule: Callable[[Any, Any], dict] = lambda cfg, step: {}
    pre_upsample: bool = False  # feed bicubic-upscaled LR (SRCNN/VDSR/DRCN)
    default_channels: int = 1
    default_lr: float = 1e-3
    default_crop: int = 128
    is_gan: bool = False
    has_batchnorm: bool = False
    make_discriminator: Callable[[Any], Any] | None = None  # GAN recipes
    # model exposes every power-of-2 level up to scale_factor via
    # apply(..., all_scales=True) (LapSRN's pyramid)
    multi_scale_out: bool = False
    # optional pre-shuffle training support (models whose tail ends in a
    # pixel shuffle): model → (apply_fn, r_last) where
    # apply_fn(variables, x, train) returns the PRE-shuffle output
    # (B, H·r/r_last, W·r/r_last, C·r_last²). The trainer then computes
    # the (permutation-invariant) loss against space_to_depth(hr) and
    # the final depth_to_space never runs in fwd OR bwd
    # (cfg.preshuffle_loss; sr/kernels/shuffle_fold.py).
    preshuffle_train: Callable[[Any], tuple] | None = None
    # FULL-tail variant (cfg.preshuffle_loss="full"): model →
    # (apply_fn, target_fn) where apply_fn returns the FULLY
    # pre-shuffled output (B, H, W, C·r²) at LR resolution — every tail
    # conv folded through every shuffle, zero d2s copies in fwd+bwd —
    # and target_fn(hr) is the matching space_to_depth chain
    # (sr/models/edsr.py:_preshuffle_train_full).
    preshuffle_train_full: Callable[[Any], tuple] | None = None

    def input_key(self) -> str:
        return "bc" if self.pre_upsample else "lr"


def register(spec: ModelSpec) -> ModelSpec:
    key = spec.name.lower()
    if key in _REGISTRY:
        raise ValueError(f"duplicate model {spec.name}")
    _REGISTRY[key] = spec
    return spec


def get_spec(name: str) -> ModelSpec:
    key = name.lower()
    if key not in _REGISTRY:
        # make sure all model modules have registered
        import sr.models  # noqa: F401

    if key not in _REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[key]


def available_models() -> list[str]:
    import sr.models  # noqa: F401

    return sorted(_REGISTRY)


def apply_model_defaults(cfg):
    """Fill SRConfig fields that the model spec defines defaults for."""
    spec = get_spec(cfg.model_name)
    kw = {}
    if cfg.lr is None:
        kw["lr"] = spec.default_lr
    return cfg.replace(**kw) if kw else cfg
