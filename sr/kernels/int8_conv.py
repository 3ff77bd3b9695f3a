"""Pallas int8 3x3 conv via VMEM-resident im2col (K=576 contraction).

WHY: XLA's int8 conv lowering at the zoo's body shapes (C_in = C_out =
64) measures ~100 TFLOP/s (PERF.md "static-scale int8") — which is the
HARDWARE ceiling for a K=64, N=64 contraction: both dims fill only half
of the 128x128 MXU, capping utilization at 25% of the 394 TOP/s int8
peak. The only way past it is a wider contraction. This kernel builds
the 9-tap im2col matrix (M, 9*C = 576) in VMEM — never materializing
it in HBM, where the im2col formulation measured 3x-slow
(scripts/bench_int8_conv.py) — and contracts K=576 in one dot, raising
the utilization ceiling to 50% (~197 TOP/s).

Geometry: NHWC, 3x3, stride 1, SAME (input pre-padded by 1). Output is
the raw int32 accumulator; the f32 rescale/bias/requant epilogue stays
in XLA, where it provably fuses (the `clamp_convert_fusion`s in the
static-int8 device profile).

Correctness is locked against ``lax.conv_general_dilated`` bit-exactly
(int32 accumulation is exact) in tests/test_pallas_int8.py via
interpret mode; the TPU compile/bench gate is
scripts/bench_pallas_int8.py (Mosaic acceptance cannot be validated on
CPU — see the round-2 depth_to_space lesson).

Reference: this replaces the reference collection's cuDNN conv calls
for the quantized serving path; no reference file implements conv
itself (SURVEY §1 L2 delegates to torch.nn.Conv2d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, out_ref, *, H, W, C, N, TH, acc_dtype):
    # x_ref: (1, H+2, W+2, C) int8/bf16 — one padded image
    # w_ref: (9*C, N) same dtype — tap-major (dy, dx) row-major
    # out_ref: (1, H, W, N) int32/f32 accumulator
    for s in range(H // TH):
        r0 = s * TH
        patches = jnp.concatenate(
            [
                x_ref[0, r0 + dy:r0 + dy + TH, dx:dx + W, :]
                .reshape(TH * W, C)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )  # (TH*W, 9C), built in VMEM
        acc = jnp.dot(patches, w_ref[:],
                      preferred_element_type=acc_dtype)
        out_ref[0, r0:r0 + TH, :, :] = acc.reshape(TH, W, N)


def _pick_strip(H: int) -> int:
    for th in (16, 8, 4, 2, 1):
        if H % th == 0:
            return th
    return 1


def _conv3x3_im2col(x: jax.Array, w: jax.Array, acc_dtype,
                    interpret: bool) -> jax.Array:
    B, H, W, C = x.shape
    N = w.shape[-1]
    TH = _pick_strip(H)
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    w2 = w.reshape(9 * C, N)  # (dy, dx, c) row-major == concat order

    return pl.pallas_call(
        functools.partial(_kernel, H=H, W=W, C=C, N=N, TH=TH,
                          acc_dtype=acc_dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H + 2, W + 2, C), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9 * C, N), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W, N), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, N), acc_dtype),
        interpret=interpret,
    )(x_pad, w2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_int8_im2col(q_x: jax.Array, q_w: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """3x3 SAME stride-1 conv, s8 x s8 -> s32, im2col-in-VMEM.

    ``q_x``: (B, H, W, C) int8; ``q_w``: (3, 3, C, N) int8 (HWIO).
    Returns (B, H, W, N) int32 — the exact accumulator, equal to
    ``lax.conv_general_dilated(..., preferred_element_type=int32)``.
    """
    return _conv3x3_im2col(q_x, q_w, jnp.int32, interpret)


@functools.partial(jax.jit, static_argnames=("interpret",))
def conv3x3_bf16_im2col(x: jax.Array, w: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """Same kernel, bf16 x bf16 -> f32: the ceiling argument holds for
    the DEFAULT bf16 serving path too — XLA's bf16 conv measures 39.4
    TFLOP/s at the zoo's K=64/N=64 shapes, ~80% of that contraction's
    49 TFLOP/s utilization bound; K=576 doubles the bound."""
    return _conv3x3_im2col(x.astype(jnp.bfloat16),
                           w.astype(jnp.bfloat16), jnp.float32,
                           interpret)


def conv3x3_int8_reference(q_x: jax.Array, q_w: jax.Array) -> jax.Array:
    """The XLA lowering this kernel must beat (and exactly match)."""
    return lax.conv_general_dilated(
        q_x, q_w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
