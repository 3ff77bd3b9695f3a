"""Native C++ data-prep library: bit-parity with Pillow and numpy paths."""

import numpy as np
import pytest
from PIL import Image

from sr.data import native
from sr.eval.metrics import psnr


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


@pytest.mark.parametrize("h,w,oh,ow", [
    (64, 64, 16, 16), (37, 53, 148, 212), (128, 96, 32, 24),
    (17, 19, 68, 76), (96, 96, 48, 48), (81, 81, 27, 27),
])
def test_native_resize_bit_exact_vs_pil_gray(lib, rng, h, w, oh, ow):
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(img, "L").resize((ow, oh), Image.BICUBIC))
    ours = native.resize_bicubic_u8(img, (oh, ow))
    np.testing.assert_array_equal(ours, pil)


def test_native_resize_bit_exact_vs_pil_rgb(lib, rng):
    img = rng.integers(0, 256, size=(40, 56, 3), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(img, "RGB").resize((14, 10), Image.BICUBIC))
    ours = native.resize_bicubic_u8(img, (10, 14))
    np.testing.assert_array_equal(ours, pil)


def test_native_single_axis_and_identity(lib, rng):
    img = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    np.testing.assert_array_equal(native.resize_bicubic_u8(img, (32, 32)), img)
    pil = np.asarray(Image.fromarray(img, "L").resize((16, 32), Image.BICUBIC))
    np.testing.assert_array_equal(native.resize_bicubic_u8(img, (32, 16)), pil)
    pil = np.asarray(Image.fromarray(img, "L").resize((32, 16), Image.BICUBIC))
    np.testing.assert_array_equal(native.resize_bicubic_u8(img, (16, 32)), pil)


def test_native_psnr_matches_python(lib, rng):
    a = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    b = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    for border in (0, 4):
        got = native.psnr_y_u8(a, b, border)
        want = psnr(a.astype(np.float64), b.astype(np.float64), border=border)
        assert got == pytest.approx(want, abs=1e-9)
    assert native.psnr_y_u8(a, a) == float("inf")


def test_fallback_paths_give_same_answers(rng):
    """The numpy fallback and native path agree (API contract)."""
    img = rng.integers(0, 256, size=(33, 29, 3), dtype=np.uint8)
    from sr.kernels.bicubic import pil_resize_exact_u8

    want = pil_resize_exact_u8(img, (66, 58))
    got = native.resize_bicubic_u8(img, (66, 58))
    np.testing.assert_array_equal(got, want)
