"""Weight initializers matching the reference models' conventions.

The reference models hand-roll ``weight_init`` helpers (normal with small
std for SRCNN-era nets, He/kaiming for VDSR/LapSRN, normal(0, 0.02) for the
GAN pair — reference: each model file's ``Net.weight_init``). Exposed here
as flax-compatible initializer factories.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.nn.initializers import he_normal, normal, zeros, constant  # noqa: F401


def conv_normal(std: float = 0.02):
    """Gaussian(0, std) — GAN-style init."""
    return normal(stddev=std)


def kaiming():
    """He normal, fan_in, for ReLU-family nets (VDSR/LapSRN)."""
    return he_normal()


INITIALIZERS = {
    "normal_001": conv_normal(0.001),
    "normal_002": conv_normal(0.02),
    "normal_01": conv_normal(0.1),
    "kaiming": kaiming(),
    "default": None,  # flax default (lecun_normal)
}


def get_kernel_init(name: str | None):
    if name is None or name == "default":
        from jax.nn.initializers import lecun_normal

        return lecun_normal()
    return INITIALIZERS[name]
