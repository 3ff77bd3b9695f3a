"""Geometric self-ensemble (D4 x8 TTA — the EDSR paper's '+' mode).

Oracle strategy: (1) group algebra — every transform round-trips;
(2) an exactly-equivariant operator (nearest-neighbor upsample) must be
a fixed point of the ensemble; (3) a real model's ensemble must equal
the hand-written numpy average of its 8 transformed forwards.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.eval.ensemble import (
    TRANSFORMS,
    inverse,
    make_self_ensemble_predict,
    transform,
)
from sr.models.registry import get_spec
from sr.utils.config import SRConfig

RNG = np.random.default_rng(7)


def _model_fn(name="ESPCN", scale=2, channels=1):
    cfg = SRConfig(model_name=name, scale_factor=scale,
                   num_channels=channels, dtype="float32")
    model = get_spec(name).make_model(cfg)
    v = model.init(jax.random.key(0),
                   np.zeros((1, 8, 8, channels), np.float32), train=False)
    return jax.jit(lambda x: model.apply(v, x, train=False))


def _manual_ensemble(fn, x):
    """The spec, written independently in numpy: average the 8
    inverse-transformed forwards of the transformed input."""
    acc = None
    for flip, k in TRANSFORMS:
        xt = np.rot90(np.flip(x, axis=2) if flip else x, k=k, axes=(1, 2))
        y = np.asarray(fn(np.ascontiguousarray(xt)))
        if y.dtype == np.uint8:
            y = y.astype(np.float32) / 255.0
        else:
            y = y.astype(np.float32)
        y = np.rot90(y, k=-k, axes=(1, 2))
        if flip:
            y = np.flip(y, axis=2)
        acc = y if acc is None else acc + y
    return acc * (1.0 / 8.0)


def test_transforms_round_trip():
    x = jnp.asarray(RNG.random((2, 5, 7, 3), np.float32))
    assert len(TRANSFORMS) == len(set(TRANSFORMS)) == 8
    for flip, k in TRANSFORMS:
        np.testing.assert_array_equal(
            np.asarray(inverse(transform(x, flip, k), flip, k)),
            np.asarray(x),
        )


def test_equivariant_fn_is_fixed_point():
    """Nearest-neighbor x2 upsampling commutes with every D4 element, so
    its self-ensemble is itself up to f32 summation rounding (the 8
    members are identical, but sequential a+a+a rounds at the 3rd add)."""

    def nearest2x(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    x = jnp.asarray(RNG.random((1, 6, 9, 1), np.float32))
    ens = make_self_ensemble_predict(nearest2x)
    np.testing.assert_allclose(np.asarray(ens(x)),
                               np.asarray(nearest2x(x)), rtol=3e-7, atol=0)


def test_matches_manual_average_real_model():
    fn = _model_fn("ESPCN", scale=2)
    x = RNG.random((1, 10, 14, 1)).astype(np.float32)  # non-square
    got = np.asarray(make_self_ensemble_predict(fn)(x))
    want = _manual_ensemble(fn, x)
    assert got.shape == (1, 20, 28, 1)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_pre_upsample_model_scale1():
    fn = _model_fn("SRCNN", scale=1)
    x = RNG.random((1, 12, 9, 1)).astype(np.float32)
    got = np.asarray(make_self_ensemble_predict(fn)(x))
    np.testing.assert_allclose(got, _manual_ensemble(fn, x), atol=2e-6)


def test_u8_output_and_u8_members():
    from sr.quant import to_u8

    raw = _model_fn("ESPCN", scale=2)
    # clamp to [0,1]: to_u8 clips, so u8 members can only round-trip the
    # float members when the float outputs live on the image range
    fn = jax.jit(lambda x: jnp.clip(raw(x), 0.0, 1.0))
    x = RNG.random((1, 8, 8, 1)).astype(np.float32)
    f32_mean = np.asarray(make_self_ensemble_predict(fn)(x))

    # wrapper-level u8: quantize ONCE after the f32 mean
    out_u8 = np.asarray(make_self_ensemble_predict(fn, output_u8=True)(x))
    assert out_u8.dtype == np.uint8
    np.testing.assert_array_equal(
        out_u8,
        np.clip(np.round(f32_mean * 255.0), 0, 255).astype(np.uint8),
    )

    # u8-emitting base fn: members are de-quantized before the mean, so
    # the result is within one grid step of the float-member mean
    fn_u8 = jax.jit(lambda x: to_u8(fn(x)))
    mixed = np.asarray(make_self_ensemble_predict(fn_u8)(x))
    assert mixed.dtype == np.float32
    np.testing.assert_allclose(mixed, f32_mean, atol=0.5 / 255.0)
    np.testing.assert_allclose(mixed, _manual_ensemble(fn_u8, x), atol=2e-6)


def test_fused_equals_loop():
    fn = _model_fn("ESPCN", scale=2)
    x = RNG.random((1, 8, 12, 1)).astype(np.float32)
    loop = np.asarray(make_self_ensemble_predict(fn)(x))
    fused = np.asarray(make_self_ensemble_predict(fn, fuse=True)(x))
    np.testing.assert_allclose(fused, loop, atol=1e-6)


@pytest.fixture(scope="module")
def espcn_params(tmp_path_factory):
    from sr.utils.checkpoint import save_params

    d = tmp_path_factory.mktemp("params")
    cfg = SRConfig(model_name="ESPCN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(d / "ESPCN_params.npz")
    save_params(path, v["params"])
    return path


def test_upscale_self_ensemble(espcn_params):
    from sr.infer import upscale

    img = (RNG.random((40, 32, 3)) * 255).astype(np.uint8)
    out = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                  dtype="float32", tile=None, self_ensemble=True)
    assert out.shape == (160, 128, 3) and out.dtype == np.uint8
    # the ensemble output is a different image than the single forward
    plain = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                    dtype="float32", tile=None)
    assert (out != plain).any()


def test_upscale_self_ensemble_tiled_equals_full(espcn_params):
    """Per-tile D4 ensemble == full-image ensemble (conv locality: a
    rotated conv net is a conv net with the same receptive field)."""
    from sr.infer import upscale

    img = (RNG.random((72, 60, 3)) * 255).astype(np.uint8)
    full = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                   dtype="float32", tile=None, self_ensemble=True)
    tiled = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                    dtype="float32", tile=36, self_ensemble=True)
    np.testing.assert_array_equal(full, tiled)
