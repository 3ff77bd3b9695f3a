"""On-device uint8 output quantization (sr.quant.to_u8).

Serving programs can emit uint8 directly — ¼ the device→host bytes of
the f32 fetch — and the result must be BIT-EQUAL to the host-side
``np.clip(np.round(sr·255))`` conversion it replaces (same f32 math,
same half-to-even rounding), on every serving variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.infer import make_serving_predict, upscale
from sr.models.registry import get_spec
from sr.utils.checkpoint import save_params
from sr.utils.config import SRConfig


def test_to_u8_matches_host_rounding():
    from sr.quant import to_u8

    y = jnp.asarray(np.linspace(-0.1, 1.1, 997, dtype=np.float32))
    got = np.asarray(jax.jit(to_u8)(y))
    want = np.clip(np.round(np.asarray(y, np.float32) * 255.0),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    # half-to-even ties, the numpy convention the host path uses
    ties = jnp.asarray(np.float32([0.5 / 255, 1.5 / 255, 2.5 / 255]))
    np.testing.assert_array_equal(np.asarray(to_u8(ties)), [0, 2, 2])


@pytest.mark.parametrize("fused,quantize", [
    (False, False), (True, False), (True, "static"),
])
def test_serving_variants_u8_equal_host(fused, quantize):
    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=2,
                   num_resblocks=2, dtype="float32")
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 12, 12, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    f32 = np.asarray(make_serving_predict(
        model, variables, fused=fused, quantize=quantize)(x))
    u8 = np.asarray(make_serving_predict(
        model, variables, fused=fused, quantize=quantize,
        output_u8=True)(x))
    assert u8.dtype == np.uint8
    want = np.clip(np.round(f32.astype(np.float32) * 255.0),
                   0, 255).astype(np.uint8)
    np.testing.assert_array_equal(u8, want)


def test_upscale_u8_default_equals_float_fetch(tmp_path):
    """upscale's on-device u8 default returns exactly what the float
    fetch + host conversion returned — including through tiling."""
    cfg = SRConfig(model_name="ESPCN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    img = SyntheticDataset(1, (80, 80), 1)[0][..., 0]
    kw = dict(scale_factor=4, dtype="float32", tile=40)  # forces tiling
    a = upscale(img, "ESPCN", path, output_u8=True, **kw)
    b = upscale(img, "ESPCN", path, output_u8=False, **kw)
    np.testing.assert_array_equal(a, b)


def test_export_u8_artifact(tmp_path):
    """An output_u8 artifact returns uint8 and matches the f32 artifact
    after host conversion."""
    from sr.export import export_predict, load_artifact, save_artifact

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    x = np.random.default_rng(3).uniform(
        0, 1, (1, 12, 12, 1)).astype(np.float32)

    kw = dict(scale_factor=2, dtype="float32", lr_size=12)
    f32 = np.asarray(load_artifact(_save(
        tmp_path / "f.hloart",
        export_predict("ESPCN", path, **kw)))(x))
    u8 = np.asarray(load_artifact(_save(
        tmp_path / "u.hloart",
        export_predict("ESPCN", path, output_u8=True, **kw)))(x))
    assert u8.dtype == np.uint8
    np.testing.assert_array_equal(
        u8, np.clip(np.round(f32.astype(np.float32) * 255.0),
                    0, 255).astype(np.uint8))


def _save(path, exp):
    from sr.export import save_artifact

    save_artifact(str(path), exp)
    return str(path)


def test_corpus_calibration_builders():
    """calib_batches pre-calibrates the static predict on a corpus: the
    result equals an explicit calibrate_scales_batches + static apply,
    and differs from single-batch lazy calibration when a later batch
    has the hotter range."""
    import flax.linen as nn

    from sr.quant import (
        calibrate_scales_batches,
        make_quantized_predict,
        quantized_apply,
    )

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    model = Net()
    x1 = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    x2 = 3.0 * jax.random.uniform(jax.random.key(2), (1, 8, 8, 2))
    v = model.init(jax.random.key(0), x1)
    fn = make_quantized_predict(model, v, mode="static",
                                calib_batches=[x1, x2])
    scales = calibrate_scales_batches(model, v, [x1, x2])
    want = np.asarray(jax.jit(lambda a: quantized_apply(
        model, v, a, scales=scales))(x2))
    np.testing.assert_array_equal(np.asarray(fn(x2)), want)
    lazy = make_quantized_predict(model, v, mode="static")
    lazy(x1)  # calibrates on the COLD batch
    assert np.abs(np.asarray(lazy(x2)) - want).max() > 0


def test_export_corpus_calibration(tmp_path):
    """export_predict accepts a LIST of calibration batches."""
    from sr.export import export_predict, load_artifact, save_artifact

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    rng = np.random.default_rng(5)
    calib = [rng.uniform(0, 1, (1, 12, 12, 1)).astype(np.float32)
             for _ in range(3)]
    exp = export_predict("ESPCN", path, scale_factor=2, dtype="float32",
                         lr_size=12, quantize="static", calib_input=calib)
    ap = str(tmp_path / "c.hloart")
    save_artifact(ap, exp)
    x = calib[0]
    out = np.asarray(load_artifact(ap)(x))
    ref = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    rng_ = max(ref.max() - ref.min(), 1e-3)
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / rng_ <= 0.05


def test_serve_u8_artifact_bucket(tmp_path):
    """A u8-output artifact serves identically to the f32 artifact
    through the bucketed path (incl. the micro-batcher, which must not
    cast the u8 output to float)."""
    from sr.export import export_bundle, save_bundle
    from sr.serve import SRService

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    outs = {}
    for u8 in (False, True):
        meta, exports = export_bundle(
            "ESPCN", path, scale_factor=2, dtype="float32",
            lr_sizes=(16,), output_u8=u8)
        bp = str(tmp_path / f"b{int(u8)}.srbundle")
        save_bundle(bp, meta, exports)
        svc = SRService(artifact=bp)
        img = SyntheticDataset(1, (14, 14), 3)[0]
        outs[u8] = svc._serve_artifact(img)
    np.testing.assert_array_equal(outs[False], outs[True])
