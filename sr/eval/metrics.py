"""Reference-convention image quality metrics.

Reproduces the evaluation conventions of the reference repo
(reference: utils.py:PSNR, utils.py:shave, dataset.py:calculate_valid_crop_size,
dataset.py:load_img):

  * PSNR is ``20·log10(255 / rmse)`` computed on de-normalized ([0,255])
    arrays, on the Y channel of YCbCr for 1-channel models.
  * A border of ``scale_factor`` pixels is shaved before PSNR.
  * Test images are center-cropped to a multiple of the scale factor.
  * YCbCr follows PIL's JPEG/BT.601 full-range convention.

These functions accept numpy or JAX arrays; pure ones are jittable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def calculate_valid_crop_size(crop_size: int, scale_factor: int) -> int:
    """Largest size ≤ crop_size divisible by scale_factor.

    (reference: dataset.py:calculate_valid_crop_size)
    """
    return crop_size - (crop_size % scale_factor)


def modulo_crop(img, scale_factor: int):
    """Center-crop (H, W[, C]) image so H and W divide by scale_factor."""
    h, w = img.shape[:2]
    ch = calculate_valid_crop_size(h, scale_factor)
    cw = calculate_valid_crop_size(w, scale_factor)
    top = (h - ch) // 2
    left = (w - cw) // 2
    return img[top : top + ch, left : left + cw]


def shave(img, border: int):
    """Remove ``border`` pixels from every spatial edge.

    Accepts (H,W), (H,W,C) or (B,H,W,C). (reference: utils.py:shave)
    """
    if border == 0:
        return img
    if img.ndim == 2 or img.ndim == 3:
        return img[border:-border, border:-border]
    if img.ndim == 4:
        return img[:, border:-border, border:-border, :]
    raise ValueError(f"unsupported ndim {img.ndim}")


def psnr(pred, target, max_val: float = 255.0, border: int = 0) -> float:
    """Peak signal-to-noise ratio on de-normalized arrays.

    (reference: utils.py:PSNR — ``20·log10(255 / rmse)`` after shave.)
    Inputs may be any float/int arrays of identical shape; computed in
    float64 on host for determinism.
    """
    p = np.asarray(shave(pred, border), dtype=np.float64)
    t = np.asarray(shave(target, border), dtype=np.float64)
    mse = np.mean((p - t) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(max_val / np.sqrt(mse)))


def ssim(pred, target, max_val: float = 255.0, border: int = 0) -> float:
    """Structural similarity (Wang et al. 2004, the SR papers' second
    metric alongside PSNR; the reference reports PSNR only).

    Canonical constants: 11×11 gaussian window σ=1.5, K1=0.01, K2=0.03;
    the SSIM map is averaged over the valid region (window fully inside
    the image — the MATLAB `filter2(..., 'valid')` convention used by
    the SR literature). Inputs are de-normalized ([0, max_val]) arrays,
    (H,W) or (H,W,C) (channels averaged); ``border`` is shaved first,
    like :func:`psnr`. Computed on host in float64.
    """
    from scipy.ndimage import gaussian_filter

    p = np.asarray(shave(pred, border), dtype=np.float64)
    t = np.asarray(shave(target, border), dtype=np.float64)
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    if p.shape[0] < 11 or p.shape[1] < 11:
        raise ValueError(f"image {p.shape} smaller than the 11x11 window")

    sigma, radius = 1.5, 5  # 11-tap gaussian (truncate = radius/sigma)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2

    def filt(x):
        # per-axis sigma (0 = no filtering over channels) instead of the
        # axes= keyword, which needs SciPy >= 1.11 (ADVICE r2)
        return gaussian_filter(x, (sigma, sigma, 0.0),
                               truncate=radius / sigma, mode="constant")

    def valid(x):
        return x[radius:-radius, radius:-radius]

    mu_p, mu_t = filt(p), filt(t)
    var_p = filt(p * p) - mu_p * mu_p
    var_t = filt(t * t) - mu_t * mu_t
    cov = filt(p * t) - mu_p * mu_t
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    )
    return float(np.mean(valid(ssim_map)))


def _gaussian_kernel_1d(sigma: float = 1.5, radius: int = 5) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def ssim_device(pred, target, max_val: float = 255.0, border: int = 0):
    """Jittable SSIM equal to :func:`ssim` — returns a scalar jnp array
    so fast (on-device) eval can report SSIM without a host round-trip
    of the image (relay D2H is the bottleneck; VERDICT r2 #4).

    Same conventions as the host path: 11×11 gaussian σ=1.5, valid-window
    mean, ``border`` shaved first, (H,W) or (H,W,C) with channels
    averaged. Computed in float32 on NORMALIZED inputs (SSIM is
    scale-invariant: p/max, t/max with C1=0.01², C2=0.03² is identical
    algebra with ~1e-7 instead of ~1e-3 f32 rounding); golden-tested
    against the float64 host implementation (tests/test_metrics.py).

    The gaussian blurs run at ``lax.Precision.HIGHEST``: TPU convs
    default to one bf16 MXU pass even for f32 operands, and the
    ``E[x²] − μ²`` variance form cancels catastrophically under that
    (~1e-3 blur error vs C2 = 9e-4 in the denominator — measured SSIM
    values of 1.05–3.87 on real eval runs, round 4). CPU convs are true
    f32, which is why the CPU golden test alone never caught it; the
    precision attribute itself is regression-locked by
    tests/test_metrics.py::test_ssim_device_conv_precision.
    """
    import jax.lax as lax

    radius = 5
    p = jnp.asarray(shave(pred, border), jnp.float32) / max_val
    t = jnp.asarray(shave(target, border), jnp.float32) / max_val
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    c1, c2 = 0.01**2, 0.03**2
    k1 = jnp.asarray(_gaussian_kernel_1d(1.5, radius), jnp.float32)

    def blur_valid(x):
        # channels → batch, two separable VALID convs with the 11-tap
        # gaussian (equals gaussian_filter(mode='constant') cropped to
        # the valid region)
        y = jnp.transpose(x, (2, 0, 1))[..., None]  # (C, H, W, 1)
        y = lax.conv_general_dilated(
            y, k1[:, None, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        y = lax.conv_general_dilated(
            y, k1[None, :, None, None], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=lax.Precision.HIGHEST,
        )
        return jnp.transpose(y[..., 0], (1, 2, 0))

    mu_p, mu_t = blur_valid(p), blur_valid(t)
    var_p = blur_valid(p * p) - mu_p * mu_p
    var_t = blur_valid(t * t) - mu_t * mu_t
    cov = blur_valid(p * t) - mu_p * mu_t
    ssim_map = ((2 * mu_p * mu_t + c1) * (2 * cov + c2)) / (
        (mu_p * mu_p + mu_t * mu_t + c1) * (var_p + var_t + c2)
    )
    return jnp.mean(ssim_map)


# ---------------------------------------------------------------------------
# YCbCr — PIL convert('YCbCr') parity (JPEG full-range BT.601)
# ---------------------------------------------------------------------------

# Forward matrix, applied to RGB in [0,255]; offsets added after.
_RGB2YCBCR = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float64,
)
_YCBCR_OFFSET = np.array([0.0, 128.0, 128.0], dtype=np.float64)

_YCBCR2RGB = np.linalg.inv(_RGB2YCBCR)


def rgb_to_ycbcr(rgb, unit_range: bool = False):
    """RGB → YCbCr (full-range BT.601, the PIL 'YCbCr' convention).

    ``rgb`` is (..., 3). If ``unit_range``, values are in [0,1] and the
    chroma offset is 128/255.
    """
    m = jnp.asarray(_RGB2YCBCR, dtype=jnp.float32)
    off = jnp.asarray(_YCBCR_OFFSET, dtype=jnp.float32)
    if unit_range:
        off = off / 255.0
    x = jnp.asarray(rgb, dtype=jnp.float32)
    # precision pin: TPU runs f32 dots as one bf16 MXU pass by default,
    # which injects ~0.25-0.5 u8-step noise into 0..255-range Y — enough
    # to skew on-device PSNR for rgb evals (CLAUDE.md device-metric
    # invariant; locked by tests/test_metrics.py jaxpr check)
    return jnp.einsum("...c,kc->...k", x, m,
                      precision=jax.lax.Precision.HIGHEST) + off


def ycbcr_to_rgb(ycc, unit_range: bool = False):
    """YCbCr → RGB inverse of :func:`rgb_to_ycbcr` (unclipped)."""
    m = jnp.asarray(_YCBCR2RGB, dtype=jnp.float32)
    off = jnp.asarray(_YCBCR_OFFSET, dtype=jnp.float32)
    if unit_range:
        off = off / 255.0
    x = jnp.asarray(ycc, dtype=jnp.float32) - off
    return jnp.einsum("...c,kc->...k", x, m,
                      precision=jax.lax.Precision.HIGHEST)
