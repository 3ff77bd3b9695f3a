"""Geometric self-ensemble (the EDSR paper's "+" eval mode).

Averages the model's predictions over the 8 elements of the dihedral
group D4 (4 rotations x optional horizontal flip): each variant of the
input is forwarded, the output is mapped back through the inverse
transform, and the 8 aligned outputs are averaged. Lim et al. (CVPRW'17,
the EDSR paper the reference's ``edsr.py`` implements) report ~+0.1-0.3
dB from exactly this at test time, with no retraining.

TPU notes:

* The transforms are pure layout ops (``jnp.rot90``/``flip``) — XLA
  lowers them to copies fused into the surrounding program; the cost is
  8 forwards, as the math requires.
* The wrapper composes BELOW halo tiling (sr/eval/tiling.py): rotating a
  haloed tile, convolving, and rotating back is the same local operator
  as restricting the full-image ensemble to that tile (a rotated conv
  net is still a conv net with the same receptive field), so
  ``tiled_predict(ensemble(fn), ...)`` stays exact.
* ``fuse=True`` traces the 8 forwards into ONE jitted program (single
  dispatch — right on production hardware). The default keeps 8
  separate dispatches: on this environment's relay a fresh program
  costs a 40-200 s remote compile, which 8 reuses of the already-
  compiled base program avoid. Non-square inputs compile two base
  programs (H,W) and (W,H) either way.

Because every transform maps the pixel grid onto itself and SR scales
both axes by the same integer factor r, ``inverse(model(t(x)))`` aligns
bit-for-bit with ``model(x)``'s grid for any r (pre-upsample models run
at r=1); no sub-pixel phase correction is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# (flip, k): flip along W first, then rotate k*90deg in the (H, W) plane.
TRANSFORMS: tuple[tuple[bool, int], ...] = tuple(
    (flip, k) for flip in (False, True) for k in range(4)
)


def transform(x, flip: bool, k: int):
    """Apply one D4 element to an NHWC batch."""
    if flip:
        x = jnp.flip(x, axis=2)
    return jnp.rot90(x, k=k, axes=(1, 2))


def inverse(y, flip: bool, k: int):
    """Invert :func:`transform` on an NHWC batch."""
    y = jnp.rot90(y, k=-k, axes=(1, 2))
    if flip:
        y = jnp.flip(y, axis=2)
    return y


def make_self_ensemble_predict(fn, output_u8: bool = False,
                               fuse: bool = False):
    """Wrap ``fn(x)`` (NHWC batch -> NHWC batch) as its D4 self-ensemble.

    ``fn`` may emit float [0,1] or uint8 (sr.quant.to_u8 programs): the
    average is always taken in f32 on the de-quantized values, and
    ``output_u8`` picks the wrapper's own output encoding. Prefer
    building the base fn WITHOUT u8 output and letting the wrapper
    quantize once at the end — averaging already-rounded u8 outputs
    loses up to half a grid step per member.

    ``fuse=True`` jits the whole 8-forward program (one dispatch);
    the default calls the base fn 8 times (see module docstring for the
    relay-driven tradeoff).
    """

    def _forward_all(x):
        acc = None
        for flip, k in TRANSFORMS:
            y = fn(transform(x, flip, k))
            # u8-emitting base fns (sr.quant.to_u8 programs): de-quantize
            # members back to [0,1] so the mean happens on the image scale
            if y.dtype == jnp.uint8:
                y = y.astype(jnp.float32) / 255.0
            else:
                y = y.astype(jnp.float32)
            y = inverse(y, flip, k)
            acc = y if acc is None else acc + y
        out = acc * (1.0 / 8.0)
        if output_u8:
            from sr.quant import to_u8

            return to_u8(out)
        return out

    return jax.jit(_forward_all) if fuse else _forward_all
