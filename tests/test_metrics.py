"""Eval-convention tests: PSNR / shave / modulo crop / YCbCr (SURVEY §4.1)."""

import numpy as np
from PIL import Image

from sr.eval.metrics import (
    calculate_valid_crop_size,
    modulo_crop,
    psnr,
    rgb_to_ycbcr,
    shave,
    ycbcr_to_rgb,
)


def test_psnr_hand_computed():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 10.0)
    # rmse = 10 → psnr = 20·log10(255/10)
    assert abs(psnr(a, b) - 20 * np.log10(25.5)) < 1e-9


def test_psnr_identical_is_inf():
    a = np.ones((4, 4))
    assert psnr(a, a) == float("inf")


def test_psnr_with_border_shave():
    a = np.zeros((8, 8))
    b = np.zeros((8, 8))
    b[0, 0] = 100.0  # error only in the shaved border
    assert psnr(a, b, border=1) == float("inf")
    assert psnr(a, b) < 50


def test_shave_shapes():
    x = np.zeros((10, 12, 3))
    assert shave(x, 2).shape == (6, 8, 3)
    assert shave(x, 0).shape == (10, 12, 3)
    assert shave(np.zeros((2, 10, 12, 3)), 1).shape == (2, 8, 10, 3)


def test_valid_crop_size():
    assert calculate_valid_crop_size(100, 4) == 100
    assert calculate_valid_crop_size(101, 4) == 100
    assert calculate_valid_crop_size(13, 3) == 12


def test_modulo_crop_centers():
    img = np.arange(7 * 9).reshape(7, 9)
    out = modulo_crop(img, 4)
    assert out.shape == (4, 8)
    assert out[0, 0] == img[1, 0]


def test_ycbcr_roundtrip(rng):
    x = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    ycc = np.asarray(rgb_to_ycbcr(x))
    back = np.asarray(ycbcr_to_rgb(ycc))
    np.testing.assert_allclose(back, x, atol=1e-2)


def test_ycbcr_matches_pil(rng):
    """Y channel matches PIL convert('YCbCr') within rounding."""
    img = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    pil_ycc = np.asarray(Image.fromarray(img, "RGB").convert("YCbCr")).astype(np.float64)
    mine = np.asarray(rgb_to_ycbcr(img.astype(np.float32)))
    assert np.abs(mine - pil_ycc).max() <= 1.0 + 1e-6


def test_op_profile_returns_device_ops():
    """op_profile parses a trace into per-op rows on any backend."""
    import jax
    import jax.numpy as jnp

    from sr.utils.profiling import op_profile

    fn = jax.jit(lambda x: jnp.dot(x, x) + 1.0)
    x = jnp.ones((128, 128), jnp.float32)
    prof = op_profile(fn, x, iters=2)
    assert prof["ops"], "no ops parsed from the trace"
    assert all("ms_per_iter" in r and "pct" in r for r in prof["ops"])
