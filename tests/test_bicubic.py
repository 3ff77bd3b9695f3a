"""Golden tests: bicubic resampling vs Pillow (SURVEY §4.1)."""

import numpy as np
import pytest
from PIL import Image

from sr.kernels.bicubic import pil_resize_exact_u8, resize2d, resize_matrix

SIZES = [
    (64, 64, 16, 16),      # ×4 down
    (128, 96, 32, 24),     # ×4 down, non-square
    (37, 53, 148, 212),    # ×4 up, odd sizes
    (17, 19, 68, 76),      # ×4 up, tiny
    (100, 100, 25, 25),
    (64, 64, 63, 61),      # ~1× odd
    (50, 40, 200, 160),    # ×4 up
    (96, 96, 48, 48),      # ×2 down
    (48, 48, 96, 96),      # ×2 up
    (81, 81, 27, 27),      # ×3 down
]


def _rand_img(h, w, c=None):
    # per-shape deterministic rng: golden results must not depend on
    # which other tests ran before (the session fixture rng is stateful)
    rng = np.random.default_rng((h * 73856093) ^ (w * 19349663) ^ (c or 1))
    shape = (h, w) if c is None else (h, w, c)
    return rng.integers(0, 256, size=shape, dtype=np.uint8)


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_exact_u8_matches_pil_gray(h, w, oh, ow):
    img = _rand_img(h, w)
    pil = np.asarray(Image.fromarray(img, "L").resize((ow, oh), Image.BICUBIC))
    mine = pil_resize_exact_u8(img, (oh, ow))
    np.testing.assert_array_equal(mine, pil)


@pytest.mark.parametrize("h,w,oh,ow", SIZES[:5])
def test_exact_u8_matches_pil_rgb(h, w, oh, ow):
    img = _rand_img(h, w, 3)
    pil = np.asarray(Image.fromarray(img, "RGB").resize((ow, oh), Image.BICUBIC))
    mine = pil_resize_exact_u8(img, (oh, ow))
    np.testing.assert_array_equal(mine, pil)


@pytest.mark.parametrize("h,w,oh,ow", SIZES)
def test_float_path_close_to_pil(h, w, oh, ow):
    """Device float path: ≤1 step on downscale; ≤2.5 on upscale.

    Upscale error >1 comes from Pillow's intermediate uint8 rounding being
    amplified by negative bicubic lobes — irreducible in a float path. The
    bit-exact integer path is used wherever parity matters (eval).
    """
    img = _rand_img(h, w)
    pil = np.asarray(
        Image.fromarray(img, "L").resize((ow, oh), Image.BICUBIC)
    ).astype(np.float64)
    mine = np.asarray(resize2d(img.astype(np.float32), (oh, ow)))
    # downscale ≤1.5 (Pillow's intermediate uint8 rounding can push a
    # near-1× resample past one step); upscale ≤2.5 (negative-lobe
    # amplification of that rounding). The exact integer path is bit-equal.
    tol = 1.5 if (oh <= h and ow <= w) else 2.5
    assert np.abs(mine - pil).max() <= tol + 1e-3


def test_resize_matrix_rows_sum_to_one():
    for a, b in [(64, 16), (16, 64), (37, 148), (100, 33)]:
        m = resize_matrix(a, b)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_identity_when_same_size():
    img = _rand_img(32, 32).astype(np.float32)
    out = np.asarray(resize2d(img, (32, 32)))
    np.testing.assert_allclose(out, img)


def test_resize2d_batched_nhwc():
    imgs = np.random.default_rng(4).integers(
        0, 256, size=(4, 32, 32, 3), dtype=np.uint8
    )
    out = np.asarray(resize2d(imgs.astype(np.float32), (8, 8)))
    assert out.shape == (4, 8, 8, 3)
    # each item matches the single-image path
    one = np.asarray(resize2d(imgs[0].astype(np.float32), (8, 8)))
    np.testing.assert_allclose(out[0], one, rtol=1e-5, atol=1e-4)


def test_exact_path_is_used_by_upscale_too():
    """img_interp parity: LR→HR bicubic up matches PIL (pre-upsample input)."""
    img = _rand_img(24, 24)
    pil = np.asarray(Image.fromarray(img, "L").resize((96, 96), Image.BICUBIC))
    mine = pil_resize_exact_u8(img, (96, 96))
    np.testing.assert_array_equal(mine, pil)
