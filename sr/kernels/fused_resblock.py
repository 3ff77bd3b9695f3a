"""Fused EDSR resblock as a Pallas TPU kernel (reference implementation).

One kernel application computes ``x + conv2(relu(conv1(x)))`` for a whole
image with everything VMEM-resident: the two 3×3 convs are row-tiled
im2col matmuls — for each tile of rows, the 9 shifted views are
concatenated on the LANE axis into an (rows·W, 9·C) operand and hit the
MXU as a single (M, 576) @ (576, C) product. Boundary handling comes
from a zero-padded VMEM scratch, so no masks and no lane-crossing
permutes (the thing Mosaic cannot tile — see PERF.md on d2s).

STATUS (measured on TPU v5-lite, PERF.md): correct (bf16-noise parity
with the flax block) but ~20 TFLOPS vs ~76 TFLOPS for XLA's native conv
— the 9 sublane-shifted slices behind the im2col concat each cost a
relayout copy, and the single-program-per-image grid leaves no
cross-program double buffering. XLA's conv lowering is simply better for
this shape, so the framework routes resblocks through XLA; this kernel
is kept as a correct, tested starting point for future kernel work
(e.g. pre-shifted layouts, pipelined row tiles).

Inference-only: no custom VJP; training keeps the XLA path. Numerical
note: accumulation is f32 via preferred_element_type; activations stay
in the input dtype between convs (same as the XLA path with
dtype=bfloat16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(a, b) for a in range(3) for b in range(3)]


def _im2col_rows(pad_ref, row0: int, rows: int, w: int, c: int):
    """(rows·W, 9·C) im2col block from the (H+2, W+2, C) padded scratch.

    ``row0`` is the first OUTPUT row of the tile; pad offsets are static.
    """
    cols = []
    for a, b in _TAPS:
        sub = pad_ref[row0 + a : row0 + a + rows, b : b + w, :]
        cols.append(sub.reshape(rows * w, c))
    return jnp.concatenate(cols, axis=-1)  # lane concat: 9·C


def _resblock_kernel(
    x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
    pad1, pad2, *, h: int, w: int, c: int, row_tile: int, res_scale: float,
):
    dtype = x_ref.dtype
    # zero the halo ring once; interiors get fully overwritten
    pad1[:] = jnp.zeros_like(pad1)
    pad1[1 : h + 1, 1 : w + 1, :] = x_ref[0]
    pad2[:] = jnp.zeros_like(pad2)

    n_tiles = h // row_tile
    # conv1 + relu → pad2 interior
    for t in range(n_tiles):
        r0 = t * row_tile
        block = _im2col_rows(pad1, r0, row_tile, w, c)
        acc = jnp.dot(block, w1_ref[:], preferred_element_type=jnp.float32)
        acc = jnp.maximum(acc + b1_ref[:], 0.0)
        pad2[1 + r0 : 1 + r0 + row_tile, 1 : w + 1, :] = (
            acc.reshape(row_tile, w, c).astype(dtype)
        )
    # conv2 + residual → output
    for t in range(n_tiles):
        r0 = t * row_tile
        block = _im2col_rows(pad2, r0, row_tile, w, c)
        acc = jnp.dot(block, w2_ref[:], preferred_element_type=jnp.float32)
        acc = acc + b2_ref[:]
        if res_scale != 1.0:
            acc = acc * res_scale
        o_ref[0, r0 : r0 + row_tile, :, :] = (
            x_ref[0, r0 : r0 + row_tile, :, :]
            + acc.reshape(row_tile, w, c).astype(dtype)
        )


def pack_weights(kernel1, bias1, kernel2, bias2):
    """Flax (3,3,C,C) kernels → ((9·C, C) matmul operands, f32 biases).

    Tap order must match _TAPS/_im2col_rows: kernel[a, b] multiplies the
    input shifted by (a, b), which is exactly flax's cross-correlation
    indexing — a pure reshape."""
    c = kernel1.shape[-1]
    w1 = jnp.asarray(kernel1).reshape(9 * c, c)
    w2 = jnp.asarray(kernel2).reshape(9 * c, c)
    return w1, jnp.asarray(bias1, jnp.float32), w2, jnp.asarray(bias2, jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("row_tile", "res_scale", "interpret")
)
def fused_resblock(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w2: jax.Array,
    b2: jax.Array,
    row_tile: int = 16,
    res_scale: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, H, W, C) NHWC; w: (9·C, C) packed; returns the resblock out.

    H must divide by ``row_tile``. Grid is (B,): one program per image.
    """
    bsz, h, w, c = x.shape
    assert h % row_tile == 0, (h, row_tile)
    kernel = functools.partial(
        _resblock_kernel, h=h, w=w, c=c, row_tile=row_tile,
        res_scale=res_scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, w + 2, c), x.dtype),
            pltpu.VMEM((h + 2, w + 2, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            # image-resident buffers (2 padded scratches + in/out blocks +
            # im2col tile) exceed the 16M default scoped budget at 128²
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)
