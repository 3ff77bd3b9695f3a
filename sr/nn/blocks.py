"""Parameterized NN building blocks (Flax, NHWC).

TPU-native re-design of the reference's block library
(reference: base_networks.py:{ConvBlock, DeconvBlock, ResnetBlock, PSBlock,
Upsample2xBlock}): the same activation menu (relu / prelu / lrelu / tanh /
sigmoid / none) and norm menu (batch / instance / none), in NHWC with
bfloat16-friendly dtypes and the pixel-shuffle lowered through
sr/kernels/depth_to_space.

Padding note: the reference picks torch (padding, output_padding) pairs
that keep convs shape-preserving and deconvs exact-×stride. Those exact
geometries are reproduced here with explicit padding pairs:

* ConvBlock ≡ torch ``Conv2d(padding=k//2)`` — for stride 1 this equals
  XLA 'SAME'; for stride>1 'SAME' pads asymmetrically (0,1) while torch
  pads (1,1), so the explicit pair is required for parity (verified
  numerically in tests/test_torch_parity.py).
* DeconvBlock ≡ torch ``ConvTranspose2d(padding=p, output_padding=2p-(k-s))``
  with ``p=ceil((k-s)/2)`` — the standard exact-×stride transposed-conv
  geometry (k=4,s=2 → p=1,op=0; k=9,s=4 → p=3,op=1). In
  ``lax.conv_transpose``'s forward-conv padding convention that is
  ``(k-1-p, s-1+p)``. Kernels are stored unflipped (flax convention);
  the torch-equivalent weight is the spatially flipped kernel.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from sr.kernels.depth_to_space import depth_to_space
from sr.nn.init import get_kernel_init

Dtype = Any


class PReLU(nn.Module):
    """Parametric ReLU with a single shared slope (torch default init 0.25)."""

    init_slope: float = 0.25
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "slope", lambda k: jnp.asarray(self.init_slope, self.param_dtype)
        )
        return jnp.where(x >= 0, x, x * a.astype(x.dtype))


def activation(name: Optional[str]) -> Optional[Callable]:
    """Activation menu (reference: base_networks.py activation arg)."""
    if name is None or name == "none":
        return None
    table = {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, negative_slope=0.2),
        "tanh": nn.tanh,
        "sigmoid": nn.sigmoid,
    }
    if name == "prelu":
        # module-level activation; callers instantiate PReLU themselves
        raise ValueError("prelu is a module; use blocks' activation='prelu'")
    return table[name]


class _NormAct(nn.Module):
    """Shared norm+activation tail used by all blocks."""

    norm: Optional[str] = None
    act: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
        elif self.norm == "instance":
            # instance norm = GroupNorm with one group per channel
            x = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(x)
        if self.act == "prelu":
            x = PReLU()(x)
        else:
            fn = activation(self.act)
            if fn is not None:
                x = fn(x)
        return x


class ConvBlock(nn.Module):
    """Conv → [norm] → [act]. (reference: base_networks.py:ConvBlock)"""

    features: int
    kernel_size: int = 3
    stride: int = 1
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    use_bias: bool = True
    kernel_init: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2  # torch Conv2d(padding=k//2) geometry
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=self.use_bias,
            kernel_init=get_kernel_init(self.kernel_init),
            dtype=self.dtype,
        )(x)
        return _NormAct(self.norm, self.act, self.dtype)(x, train)


class DeconvBlock(nn.Module):
    """Transposed conv (exact ×stride upsampling) → [norm] → [act].

    (reference: base_networks.py:DeconvBlock)
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    use_bias: bool = True
    kernel_init: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s = self.kernel_size, self.stride
        # torch ConvTranspose2d(padding=p, output_padding=2p-(k-s)) geometry,
        # expressed in lax.conv_transpose's forward-conv padding convention
        # (left crop from the full output = k-1-lo); see module docstring.
        p = -(-(k - s) // 2)
        lo, hi = k - 1 - p, s - 1 + p
        x = nn.ConvTranspose(
            self.features,
            (k, k),
            strides=(s, s),
            padding=((lo, hi), (lo, hi)),
            use_bias=self.use_bias,
            kernel_init=get_kernel_init(self.kernel_init),
            dtype=self.dtype,
        )(x)
        return _NormAct(self.norm, self.act, self.dtype)(x, train)


class ResnetBlock(nn.Module):
    """conv-[norm]-act-conv-[norm] + residual·scale.

    (reference: base_networks.py:ResnetBlock; ``res_scale`` covers EDSR's
    residual scaling — Lim et al. CVPRW'17.)
    """

    features: int
    kernel_size: int = 3
    act: Optional[str] = "relu"
    norm: Optional[str] = "batch"
    res_scale: float = 1.0
    kernel_init: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            kernel_init=get_kernel_init(self.kernel_init),
            dtype=self.dtype,
        )(x)
        h = _NormAct(self.norm, self.act, self.dtype)(h, train)
        h = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            kernel_init=get_kernel_init(self.kernel_init),
            dtype=self.dtype,
        )(h)
        if self.norm == "batch":
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(h)
        elif self.norm == "instance":
            h = nn.GroupNorm(num_groups=None, group_size=1, dtype=self.dtype)(h)
        if self.res_scale != 1.0:
            h = h * jnp.asarray(self.res_scale, h.dtype)
        return x + h


class PSBlock(nn.Module):
    """Conv to C·r² then pixel shuffle. (reference: base_networks.py:PSBlock)"""

    features: int  # output channels AFTER the shuffle
    scale_factor: int = 2
    kernel_size: int = 3
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    kernel_init: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, shuffle: bool = True):
        r = self.scale_factor
        x = nn.Conv(
            self.features * r * r,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            kernel_init=get_kernel_init(self.kernel_init),
            dtype=self.dtype,
        )(x)
        if not shuffle:
            # pre-shuffle tap for the training-side fold
            # (sr/kernels/shuffle_fold.py): exact only when nothing
            # follows the conv inside this block
            assert self.act is None and self.norm is None, (
                "shuffle=False requires an act/norm-free PSBlock"
            )
            return x
        x = depth_to_space(x, r)
        return _NormAct(self.norm, self.act, self.dtype)(x, train)


class Upsample2xBlock(nn.Module):
    """×2 upsampling: 'deconv', 'ps' (sub-pixel), or 'rnc' (resize+conv).

    (reference: base_networks.py:Upsample2xBlock)
    """

    features: int
    upsample: str = "deconv"
    act: Optional[str] = "relu"
    norm: Optional[str] = None
    kernel_init: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.upsample == "deconv":
            return DeconvBlock(
                self.features, 4, 2, self.act, self.norm,
                kernel_init=self.kernel_init, dtype=self.dtype,
            )(x, train)
        if self.upsample == "ps":
            return PSBlock(
                self.features, 2, 3, self.act, self.norm,
                kernel_init=self.kernel_init, dtype=self.dtype,
            )(x, train)
        if self.upsample == "rnc":
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            return ConvBlock(
                self.features, 3, 1, self.act, self.norm,
                kernel_init=self.kernel_init, dtype=self.dtype,
            )(x, train)
        raise ValueError(f"unknown upsample mode {self.upsample!r}")
