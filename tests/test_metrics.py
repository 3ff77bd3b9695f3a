"""Eval-convention tests: PSNR / shave / modulo crop / YCbCr (SURVEY §4.1)."""

import numpy as np
import pytest
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


def _ssim_reference(p, t, max_val=255.0):
    """Independent sliding-window SSIM (no scipy): explicit 11x11
    gaussian window, valid-region mean — the Wang et al. formula."""
    import numpy as np

    p = p.astype(np.float64)
    t = t.astype(np.float64)
    if p.ndim == 2:
        p, t = p[..., None], t[..., None]
    r, sigma = 5, 1.5
    ax = np.arange(-r, r + 1)
    g1 = np.exp(-(ax ** 2) / (2 * sigma ** 2))
    w = np.outer(g1, g1)
    w /= w.sum()
    c1, c2 = (0.01 * max_val) ** 2, (0.03 * max_val) ** 2
    h, wd, c = p.shape
    vals = []
    for ch in range(c):
        for i in range(h - 2 * r):
            for j in range(wd - 2 * r):
                wp = p[i:i + 11, j:j + 11, ch]
                wt = t[i:i + 11, j:j + 11, ch]
                mp, mt = (w * wp).sum(), (w * wt).sum()
                vp = (w * wp * wp).sum() - mp * mp
                vt = (w * wt * wt).sum() - mt * mt
                cov = (w * wp * wt).sum() - mp * mt
                vals.append(((2 * mp * mt + c1) * (2 * cov + c2))
                            / ((mp * mp + mt * mt + c1) * (vp + vt + c2)))
    return float(np.mean(vals))


def test_ssim_matches_sliding_window_reference():
    import numpy as np

    from sr.eval.metrics import ssim

    rng = np.random.default_rng(3)
    t = rng.integers(0, 255, (24, 20), np.uint8).astype(np.float64)
    p = np.clip(t + rng.normal(0, 12, t.shape), 0, 255)
    assert ssim(p, t) == pytest.approx(_ssim_reference(p, t), abs=1e-9)


def test_ssim_properties():
    import numpy as np

    from sr.eval.metrics import ssim

    rng = np.random.default_rng(4)
    t = rng.integers(0, 255, (32, 32, 3), np.uint8).astype(np.float64)
    assert ssim(t, t) == pytest.approx(1.0, abs=1e-12)  # identity
    noisy1 = np.clip(t + rng.normal(0, 5, t.shape), 0, 255)
    noisy2 = np.clip(t + rng.normal(0, 40, t.shape), 0, 255)
    s1, s2 = ssim(noisy1, t), ssim(noisy2, t)
    assert s2 < s1 < 1.0  # more noise, lower SSIM
    assert ssim(noisy1, t) == pytest.approx(ssim(t, noisy1), abs=1e-12)
    with pytest.raises(ValueError):
        ssim(t[:8, :8], t[:8, :8])  # smaller than the window


def test_evaluate_reports_ssim():
    import jax
    import numpy as np

    from sr.data.datasets import SyntheticDataset
    from sr.eval.runner import evaluate

    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=3)
    predict = jax.jit(lambda x: jax.image.resize(
        x, (x.shape[0], x.shape[1] * 2, x.shape[2] * 2, x.shape[3]),
        "nearest"))
    res = evaluate(predict, ds, 2, channels=3, dataset_name="synthetic",
                   color_space="rgb")
    s = res.summary()
    assert 0.0 < s["ssim_bicubic"] <= 1.0
    assert 0.0 < s["ssim_sr"] <= 1.0


def test_ssim_closed_form_oracles():
    """EXTERNAL oracle (VERDICT r2 weak #4): for constant images the SSIM
    map has a closed form straight from Wang et al. (2004) eq. 13 — no
    implementation involved. var=cov=0, mu exact in the valid region, so
    SSIM = (2*mu_p*mu_t + C1) / (mu_p^2 + mu_t^2 + C1)."""
    import numpy as np

    from sr.eval.metrics import ssim

    t = np.full((32, 32), 100.0)
    assert ssim(t, t) == pytest.approx(1.0, abs=1e-15)

    c1 = (0.01 * 255.0) ** 2
    for d in (10.0, 50.0, -30.0):
        expect = (2 * 100.0 * (100.0 + d) + c1) / (
            100.0**2 + (100.0 + d) ** 2 + c1
        )
        assert ssim(t + d, t) == pytest.approx(expect, abs=1e-12)
    # black vs white: pure luminance floor
    z, o = np.zeros((20, 20)), np.full((20, 20), 255.0)
    assert ssim(o, z) == pytest.approx(c1 / (255.0**2 + c1), abs=1e-12)


def test_ssim_device_matches_host():
    """The jittable on-device SSIM is golden against the float64 host
    implementation (VERDICT r2 #4)."""
    import numpy as np

    from sr.eval.metrics import ssim, ssim_device

    rng = np.random.default_rng(7)
    for shape, border in (((32, 32), 0), ((40, 24, 3), 2), ((57, 63), 4)):
        t = rng.integers(0, 255, shape).astype(np.float64)
        p = np.clip(t + rng.normal(0, 15, shape), 0, 255)
        h = ssim(p, t, border=border)
        d = float(ssim_device(p, t, border=border))
        assert d == pytest.approx(h, abs=2e-6), (shape, h, d)


def test_ssim_device_conv_precision():
    """Every gaussian-blur conv inside ssim_device must carry
    Precision.HIGHEST. TPU convs default to ONE bf16 MXU pass for f32
    operands, and the E[x²]−μ² variance form cancels catastrophically
    under that (~1e-3 blur error vs C2 = 9e-4 in the denominator):
    round-4 zoo evals recorded SSIM of 1.05–3.87 — mathematically
    impossible — while this suite's CPU goldens stayed green (CPU convs
    are true f32). Locking the jaxpr attribute is the only way a
    CPU-only suite can regression-test a TPU-only numeric."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sr.eval.metrics import ssim_device

    z = jnp.zeros((32, 32), jnp.float32)
    jaxpr = jax.make_jaxpr(ssim_device)(z, z)
    convs = [e for e in jaxpr.jaxpr.eqns
             if e.primitive.name == "conv_general_dilated"]
    assert len(convs) == 10  # 5 blurs × 2 separable passes
    for e in convs:
        prec = e.params.get("precision")
        assert prec in ((lax.Precision.HIGHEST, lax.Precision.HIGHEST),
                        lax.Precision.HIGHEST), prec


def test_ycbcr_einsum_precision():
    """rgb_to_ycbcr / ycbcr_to_rgb feed the ON-DEVICE eval path
    (sr/eval/runner.py:_device_y_metrics for color_space='rgb'), so
    their dots carry the same CLAUDE.md device-metric precision pin as
    ssim_device's convs: TPU runs f32 dots as one bf16 MXU pass by
    default, injecting ~0.25-0.5 u8-step noise into 0..255-range Y while
    CPU goldens stay green (round-4 review finding)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sr.eval.metrics import rgb_to_ycbcr, ycbcr_to_rgb

    z = jnp.zeros((8, 8, 3), jnp.float32)
    for fn in (rgb_to_ycbcr, ycbcr_to_rgb):
        jaxpr = jax.make_jaxpr(fn)(z)
        dots = [e for e in jaxpr.jaxpr.eqns
                if e.primitive.name == "dot_general"]
        assert dots, f"{fn.__name__}: einsum did not lower to dot_general"
        for e in dots:
            prec = e.params.get("precision")
            assert prec in (
                (lax.Precision.HIGHEST, lax.Precision.HIGHEST),
                lax.Precision.HIGHEST,
            ), (fn.__name__, prec)
