"""PIL-parity bicubic resampling as static XLA matmuls + exact host path.

The reference degrades HR images to LR with ``PIL.Image.resize(..., BICUBIC)``
(reference: dataset.py:DatasetFromFolder.__getitem__, utils.py:img_interp).
Pillow's resampler is NOT a fixed 4-tap bicubic: on downscale it widens the
kernel support by the scale factor (antialiasing), and for 8-bit images it
runs two separable fixed-point integer passes (horizontal first, then
vertical) with PRECISION_BITS = 32-8-2 coefficient quantization.

PSNR parity (≤0.05 dB, BASELINE.json.metric) requires matching this
degradation. Two implementations are provided:

  * :func:`resize2d` — float32, jittable, device-side. The per-output-pixel
    weights are static for a given (in_size, out_size) pair, so the whole
    resample is two dense matmuls that XLA tiles onto the MXU. Used in the
    on-device training pipeline and ``img_interp``-style pre-upsampling.
    Max deviation from Pillow is <1 uint8 step (validated by golden tests).

  * :func:`pil_resize_exact_u8` — host-side numpy integer path replicating
    Pillow's fixed-point arithmetic BIT-EXACTLY (validated by golden tests
    against Pillow 12). Used when preparing eval LR inputs so that reported
    PSNR is computed against exactly the reference's degradation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Pillow's fixed-point coefficient precision for 8-bit channels
# (libImaging/Resample.c: #define PRECISION_BITS (32 - 8 - 2)).
PRECISION_BITS = 32 - 8 - 2

#: Pillow filter supports (libImaging/Resample.c struct filters).
_SUPPORT = {"bicubic": 2.0, "bilinear": 1.0, "box": 0.5}


def _bicubic_filter(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """Keys cubic convolution kernel with a=-0.5 (Pillow's bicubic)."""
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


def _bilinear_filter(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.where(x < 1.0, 1.0 - x, 0.0)


def _box_filter(x: np.ndarray) -> np.ndarray:
    return np.where((x > -0.5) | (x == -0.5), np.where(x < 0.5, 1.0, 0.0), 0.0)


_FILTERS = {
    "bicubic": _bicubic_filter,
    "bilinear": _bilinear_filter,
    "box": _box_filter,
}


def precompute_coeffs(
    in_size: int, out_size: int, filter: str = "bicubic"
) -> tuple[np.ndarray, np.ndarray]:
    """Per-output-pixel resampling taps, exactly as Pillow computes them.

    Returns ``(bounds, kk)`` where ``bounds[o]`` is the first input index
    contributing to output pixel ``o`` and ``kk[o, :]`` the (normalized)
    float64 tap weights (zero-padded to the common kernel size).
    """
    support = _SUPPORT[filter]
    filt = _FILTERS[filter]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    sup = support * filterscale
    ss = 1.0 / filterscale
    ksize = int(np.ceil(sup)) * 2 + 1
    bounds = np.zeros(out_size, dtype=np.int64)
    kk = np.zeros((out_size, ksize), dtype=np.float64)
    for o in range(out_size):
        center = (o + 0.5) * scale
        xmin = max(int(center - sup + 0.5), 0)
        xmax = min(int(center + sup + 0.5), in_size)
        n = xmax - xmin
        w = filt((np.arange(n) + xmin - center + 0.5) * ss)
        wsum = w.sum()
        if wsum != 0.0:
            w = w / wsum
        bounds[o] = xmin
        kk[o, :n] = w
    return bounds, kk


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int, filter: str = "bicubic") -> np.ndarray:
    """Dense (out_size, in_size) float32 resampling matrix.

    Banded (bandwidth = kernel support), but dense serves the MXU better
    than gathers at SR image sizes. Cached per (in, out, filter).
    """
    if in_size == out_size:
        return np.eye(out_size, dtype=np.float32)
    bounds, kk = precompute_coeffs(in_size, out_size, filter)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for o in range(out_size):
        lo = bounds[o]
        n = min(kk.shape[1], in_size - lo)
        m[o, lo : lo + n] = kk[o, :n]
    return m.astype(np.float32)


def resize2d(
    x: jax.Array,
    out_hw: tuple[int, int],
    filter: str = "bicubic",
    clip: bool = True,
    precision=None,
) -> jax.Array:
    """Pillow-parity separable resize of NHWC (or HWC/HW) float images.

    ``x`` is float in [0, 255] (or [0,1] — the op is linear, any scale
    works; ``clip`` then clamps to [0, max] only when operating on [0,255]
    via the caller's convention — here we clamp to the input's value range
    only if ``clip`` and the range is known to be [0,255]-like; we simply
    skip clamping for unit-range callers by passing clip=False).

    Jittable with static ``out_hw``. Two dense matmuls → MXU.

    Precision note: the golden-tested "<1 u8 step vs Pillow" bound
    (tests/test_bicubic.py) is a CPU/true-f32 property. On TPU the
    default ``precision=None`` lowers each f32 matmul to ONE bf16 MXU
    pass, adding ~±0.7 u8-step rounding for [0,255] inputs — acceptable
    for the TRAINING degrade (this is why the pipeline leaves it fast;
    eval never uses this function: eval-parity resampling is the exact
    host path, sr/data/native + pil_resize_exact_u8). Pass
    ``precision=jax.lax.Precision.HIGHEST`` where the CPU-grade bound
    must hold on device.
    """
    h_out, w_out = out_hw
    squeeze = []
    if x.ndim == 2:
        x = x[None, :, :, None]
        squeeze = [0, -1]
    elif x.ndim == 3:
        x = x[None]
        squeeze = [0]
    _, h_in, w_in, _ = x.shape
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    if w_in != w_out:
        mw = jnp.asarray(resize_matrix(w_in, w_out, filter))
        # (B,H,W,C) x (Wout,W) → (B,H,Wout,C)
        xf = jnp.einsum("bhwc,ow->bhoc", xf, mw,
                        preferred_element_type=jnp.float32,
                        precision=precision)
        if clip:
            # Pillow clamps the intermediate pass to [0,255] (uint8 temp
            # image); without this, bicubic overshoot at edges diverges
            # from PIL by many steps on upscale.
            xf = jnp.clip(xf, 0.0, 255.0)
    if h_in != h_out:
        mh = jnp.asarray(resize_matrix(h_in, h_out, filter))
        xf = jnp.einsum("bhwc,oh->bowc", xf, mh,
                        preferred_element_type=jnp.float32,
                        precision=precision)
    if clip:
        xf = jnp.clip(xf, 0.0, 255.0)
    out = xf.astype(dtype)
    if squeeze:
        out = out[0]
        if len(squeeze) == 2:
            out = out[..., 0]
    return out


def resize2d_unit(
    x: jax.Array, out_hw: tuple[int, int], filter: str = "bicubic"
) -> jax.Array:
    """resize2d for [0,1]-normalized tensors (clamps to [0,1])."""
    y = resize2d(x, out_hw, filter, clip=False)
    return jnp.clip(y, 0.0, 1.0)


def img_interp(x: jax.Array, scale_factor: int, filter: str = "bicubic") -> jax.Array:
    """Bicubic-upscale a batch/image by ``scale_factor``.

    (reference: utils.py:img_interp — the pre-upsampling step feeding
    SRCNN/VDSR/DRCN, which upstream ran on CPU through PIL inside the hot
    loop; here it's two device matmuls.) Accepts (H,W), (H,W,C) or NHWC,
    values in [0,1].
    """
    h, w = (x.shape[-3], x.shape[-2]) if x.ndim >= 3 else x.shape
    return resize2d_unit(x, (h * scale_factor, w * scale_factor), filter)


# ---------------------------------------------------------------------------
# Host-side bit-exact Pillow path (uint8 fixed-point, numpy)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=256)
def _int_coeff_matrix(in_size: int, out_size: int, filter: str = "bicubic") -> np.ndarray:
    """Dense (out, in) int64 matrix of Pillow's quantized coefficients."""
    bounds, kk = precompute_coeffs(in_size, out_size, filter)
    v = kk * (1 << PRECISION_BITS)
    ikk = np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5)).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.int64)
    for o in range(out_size):
        lo = bounds[o]
        n = min(ikk.shape[1], in_size - lo)
        m[o, lo : lo + n] = ikk[o, :n]
    return m


def _pass_u8(img: np.ndarray, m: np.ndarray) -> np.ndarray:
    """One fixed-point pass contracting the LAST axis of ``img`` with m.T."""
    acc = img.astype(np.int64) @ m.T.astype(np.int64)
    acc += 1 << (PRECISION_BITS - 1)
    acc >>= PRECISION_BITS
    return np.clip(acc, 0, 255).astype(np.uint8)


def pil_resize_exact_u8(
    img: np.ndarray, out_hw: tuple[int, int], filter: str = "bicubic"
) -> np.ndarray:
    """Bit-exact replica of ``PIL.Image.resize`` for uint8 (H,W[,C]) arrays.

    Matches Pillow's pass order (horizontal, then vertical) including the
    intermediate uint8 rounding between passes.
    """
    assert img.dtype == np.uint8, "exact path operates on uint8"
    out_h, out_w = out_hw
    chan_last = img.ndim == 3
    x = img
    h_in, w_in = x.shape[:2]
    if w_in != out_w:  # horizontal pass: contract W
        m = _int_coeff_matrix(w_in, out_w, filter)
        if chan_last:
            x = np.moveaxis(_pass_u8(np.moveaxis(x, 1, -1), m), -1, 1)
        else:
            x = _pass_u8(x, m)
    if h_in != out_h:  # vertical pass: contract H
        m = _int_coeff_matrix(h_in, out_h, filter)
        x = np.moveaxis(_pass_u8(np.moveaxis(x, 0, -1), m), -1, 0)
    return x
