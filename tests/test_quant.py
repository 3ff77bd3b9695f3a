"""Int8 PTQ serving path (sr/quant.py).

Strategy: the quantized conv is EXACT when weights and activations
already lie on the int8 grid (q * scale with |q| <= 127), so correctness
of the geometry + int32 accumulation + rescale is tested bit-tight,
separately from the (lossy, measured-in-PERF.md) rounding step.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.quant import (
    int8_conv,
    make_quantized_predict,
    quantize_activation,
    quantize_kernel,
    quantized_apply,
)


def _grid(rng, shape, scale):
    """Values exactly representable as int8 * scale, with the range
    pinned (a 127 present in EVERY sample) so the dynamic per-sample
    requantization recovers ``scale`` exactly."""
    q = rng.integers(-127, 128, size=shape).astype(np.float32)
    q.reshape(shape[0], -1)[:, 0] = 127
    return jnp.asarray(q * scale)


def test_quantize_kernel_roundtrip_bound():
    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    q, s = quantize_kernel(k)
    assert q.dtype == jnp.int8
    err = jnp.abs(q.astype(jnp.float32) * s - k)
    # symmetric rounding: error <= s/2 per output channel
    assert bool(jnp.all(err <= s[None, None, None, :] * 0.5 + 1e-7))


def test_quantize_activation_exact_on_grid():
    rng = np.random.default_rng(1)
    x = _grid(rng, (2, 5, 5, 3), 0.013)
    q, s = quantize_activation(x)
    assert s.shape == (2, 1, 1, 1)  # per-sample, not per-tensor
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), np.asarray(x),
        rtol=0, atol=1e-6,
    )


@pytest.mark.parametrize(
    "stride,padding", [(1, ((1, 1), (1, 1))), (2, "SAME"), (1, "VALID")]
)
def test_int8_conv_exact_on_grid(stride, padding):
    rng = np.random.default_rng(2)
    m = nn.Conv(12, (3, 3), strides=(stride, stride), padding=padding)
    x = _grid(rng, (2, 9, 9, 5), 1 / 64)
    variables = m.init(jax.random.key(0), x)
    # put params on the int8 grid (per-channel scale for the kernel)
    kscale = np.linspace(0.002, 0.01, 12).astype(np.float32)
    kq = np.asarray(
        rng.integers(-127, 128, size=(3, 3, 5, 12)), np.float32
    )
    kq[0, 0, 0, :] = 127  # pin per-channel range -> scale recovered
    kernel = kq * kscale
    bias = rng.normal(size=(12,)).astype(np.float32)
    variables = {"params": {"kernel": jnp.asarray(kernel),
                            "bias": jnp.asarray(bias)}}
    ref = m.apply(variables, x)
    out = int8_conv(x, m.bind(variables))
    assert out.shape == ref.shape
    # int32 accumulation is exact; the only noise is the f32 rescale
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-4
    )


def test_quantized_apply_intercepts_single_conv_exactly():
    """One grid-aligned conv through the INTERCEPTOR path equals the
    f32 apply bit-tight — proves interception swaps the op without
    perturbing geometry."""
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(6, (3, 3), padding="SAME")(x)

    rng = np.random.default_rng(3)
    model = Net()
    x = _grid(rng, (1, 8, 8, 2), 1 / 127)
    kq = np.asarray(rng.integers(-127, 128, size=(3, 3, 2, 6)),
                    np.float32)
    kq[0, 0, 0, :] = 127
    variables = {"params": {"Conv_0": {
        "kernel": jnp.asarray(kq * 0.004),
        "bias": jnp.asarray(rng.normal(size=(6,)).astype(np.float32)),
    }}}
    ref = model.apply(variables, x)
    out = quantized_apply(model, variables, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=1e-4
    )


def test_quantized_apply_two_layer_tolerance():
    """Chained convs requantize the intermediate activation — lossy by
    design; error stays at the few-percent level of the output scale."""
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    model = Net()
    x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    variables = model.init(jax.random.key(0), x)
    ref = np.asarray(model.apply(variables, x))
    out = np.asarray(quantized_apply(model, variables, x))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.05 * scale


def test_quantized_predict_uses_int8_convs():
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    spec = get_spec("EDSR")
    cfg = SRConfig(model_name="EDSR", scale_factor=2, num_channels=3,
                   dtype="float32", num_resblocks=2, base_filter=8)
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 12, 12, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    fn = make_quantized_predict(model, variables)
    txt = jax.jit(lambda a: quantized_apply(model, variables, a,
                                            train=False)).lower(x).as_text()
    assert "xi8>" in txt and "xi32>" in txt, (
        "int8 conv path not in the lowered StableHLO"
    )
    y = fn(x)
    assert y.shape == (1, 24, 24, 3)


def test_quantized_zoo_close_to_f32():
    """Whole-zoo smoke: quantized forward stays within a loose bound of
    the f32 graph even at random init (trained-weight quality deltas are
    measured in PERF.md)."""
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    for name in ["SRCNN", "ESPCN"]:
        spec = get_spec(name)
        cfg = SRConfig(model_name=name, scale_factor=2,
                       num_channels=spec.default_channels,
                       dtype="float32")
        model = spec.make_model(cfg)
        size = 24 if spec.pre_upsample else 12
        x = jax.random.uniform(
            jax.random.key(1), (1, size, size, spec.default_channels)
        )
        variables = model.init(jax.random.key(0), x, train=False)
        ref = np.asarray(model.apply(variables, x, train=False))
        out = np.asarray(quantized_apply(model, variables, x,
                                         train=False))
        assert out.shape == ref.shape
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(out - ref).max() <= 0.05 * scale + 5e-3


def test_upscale_quantize_close_to_f32(tmp_path):
    """The user-facing serving path: upscale(quantize=True) matches the
    f32 forward within a few u8 levels."""
    from sr.data.datasets import SyntheticDataset
    from sr.infer import upscale
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    img = SyntheticDataset(1, (40, 40), 1)[0][..., 0]
    ref = upscale(img, "ESPCN", path, scale_factor=4, dtype="float32",
                  tile=None)
    out = upscale(img, "ESPCN", path, scale_factor=4, dtype="float32",
                  tile=None, quantize=True)
    assert out.shape == ref.shape
    # random-init activations are small; int8 requantization noise stays
    # within a few u8 levels
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 6


def test_export_quantized_artifact_roundtrip(tmp_path):
    """Quantized export: the serialized artifact carries int8 literals
    and serves without any model code."""

    from sr.export import export_predict, load_artifact, save_artifact
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    exp = export_predict("ESPCN", path, scale_factor=2, dtype="float32",
                         lr_size=16, quantize=True)
    assert "xi8>" in exp.mlir_module()
    art = str(tmp_path / "espcn_int8.hloart")
    save_artifact(art, exp)
    served = load_artifact(art)
    y = served(jnp.zeros((1, 16, 16, 1), jnp.float32))
    assert y.shape == (1, 32, 32, 1)


def test_export_static_quantized_artifact_roundtrip(tmp_path):
    """quantize='static': calibration happens pre-export on a synthetic
    input and the artifact carries the baked scales (int8 literals, no
    on-device amax reduce)."""
    from sr.export import export_predict, load_artifact, save_artifact
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    exp = export_predict("ESPCN", path, scale_factor=2, dtype="float32",
                         lr_size=16, quantize="static")
    txt = exp.mlir_module()
    assert "xi8>" in txt
    art = str(tmp_path / "espcn_int8s.hloart")
    save_artifact(art, exp)
    served = load_artifact(art)
    y = served(jnp.full((1, 16, 16, 1), 0.5, jnp.float32))
    assert y.shape == (1, 32, 32, 1)


def test_upscale_quantize_static_close_to_f32(tmp_path):
    from sr.data.datasets import SyntheticDataset
    from sr.infer import upscale
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "ESPCN_params.npz")
    save_params(path, v["params"])
    img = SyntheticDataset(1, (40, 40), 1)[0][..., 0]
    ref = upscale(img, "ESPCN", path, scale_factor=4, dtype="float32",
                  tile=None)
    out = upscale(img, "ESPCN", path, scale_factor=4, dtype="float32",
                  tile=None, quantize="static")
    assert out.shape == ref.shape
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 6


def test_upscale_static_fused_tiled_composition(tmp_path):
    """The production fast path: quantize='static' + fused=True +
    halo tiling, all composed through upscale(). Locks that the
    quant-fused builder slots into the tiling contract (interior-exact
    halos) and calibrates once on the first tile."""
    from sr.infer import upscale
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", scale_factor=2, num_channels=3,
                   dtype="float32")  # default topology: upscale()
    model = get_spec("EDSR").make_model(cfg)  # rebuilds from defaults
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 3), np.float32),
                   train=False)
    path = str(tmp_path / "EDSR_params.npz")
    save_params(path, v["params"])
    img = np.random.default_rng(3).integers(0, 255, (40, 40, 3), np.uint8)
    ref = upscale(img, "EDSR", path, scale_factor=2, dtype="float32",
                  tile=None)
    out = upscale(img, "EDSR", path, scale_factor=2, dtype="float32",
                  tile=24, fused=True, quantize="static")
    assert out.shape == ref.shape == (80, 80, 3)
    # int8 + border-band: loose u8 bound, interior dominated by quant noise
    assert np.abs(out.astype(int) - ref.astype(int)).mean() <= 4


def test_export_bundle_fused_static(tmp_path):
    """fused=True + quantize='static' bundle: the quant-fused EDSR
    serving graph exports and serves per bucket."""
    from sr.export import export_bundle, load_bundle, save_bundle
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", scale_factor=2, num_channels=3,
                   dtype="float32", num_resblocks=2, base_filter=8)
    model = get_spec("EDSR").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 3), np.float32),
                   train=False)
    path = str(tmp_path / "EDSR_params.npz")
    save_params(path, v["params"])
    meta, exports = export_bundle(
        "EDSR", path, scale_factor=2, num_channels=3, dtype="float32",
        fused=True, lr_sizes=(16, 24), quantize="static",
        cfg_overrides={"num_resblocks": 2, "base_filter": 8})
    assert all("xi8>" in e.mlir_module() for e in exports)
    art = str(tmp_path / "edsr_qf.srbundle")
    save_bundle(art, meta, exports)
    _, buckets = load_bundle(art)
    for h, w, fn in buckets:
        y = fn(jnp.full((1, h, w, 3), 0.4, jnp.float32))
        assert y.shape == (1, 2 * h, 2 * w, 3)
        assert np.isfinite(np.asarray(y)).all()


def test_serve_rejects_quantize_with_artifact():
    from sr.serve import SRService

    with pytest.raises(ValueError, match="quantize"):
        SRService(artifact="x.hloart", quantize=True)


def test_quantized_batch_independence():
    """Per-sample activation scales: a request's quantized output must
    not depend on what it was micro-batched with (a bright co-batched
    image must not coarsen this image's grid)."""
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    model = Net()
    x0 = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    bright = 100.0 * jax.random.uniform(jax.random.key(2), (1, 8, 8, 2))
    variables = model.init(jax.random.key(0), x0)
    solo = np.asarray(quantized_apply(model, variables, x0))
    paired = np.asarray(
        quantized_apply(model, variables, jnp.concatenate([x0, bright]))
    )[:1]
    np.testing.assert_array_equal(solo, paired)


def test_quantize_activation_static_exact_on_grid():
    from sr.quant import quantize_activation_static

    rng = np.random.default_rng(7)
    x = _grid(rng, (2, 5, 5, 3), 0.013)
    q, s = quantize_activation_static(x, 0.013)
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * float(s), np.asarray(x),
        rtol=0, atol=1e-6,
    )
    # out-of-range saturates instead of wrapping
    q2, _ = quantize_activation_static(x * 100.0, 0.013)
    assert int(jnp.max(q2)) == 127 and int(jnp.min(q2)) == -127


def test_calibrate_scales_sites_and_static_apply():
    from sr.quant import calibrate_scales

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(x))
            return nn.Conv(2, (3, 3), padding="SAME")(x)

    model = Net()
    x = jax.random.uniform(jax.random.key(1), (2, 8, 8, 2))
    variables = model.init(jax.random.key(0), x)
    scales = calibrate_scales(model, variables, x)
    assert set(scales) == {"Conv_0", "Conv_1"}
    # default is per-input-channel: the first conv's scale vector is the
    # input's per-channel amax/127
    np.testing.assert_allclose(
        scales["Conv_0"],
        np.asarray(jnp.max(jnp.abs(x), axis=(0, 1, 2))) / 127.0,
        rtol=1e-6)
    # per-tensor mode preserved behind the flag
    pt = calibrate_scales(model, variables, x, per_channel=False)
    np.testing.assert_allclose(
        pt["Conv_0"], float(jnp.max(jnp.abs(x))) / 127.0, rtol=1e-6)
    ref = np.asarray(model.apply(variables, x))
    out = np.asarray(quantized_apply(model, variables, x, scales=scales))
    scale = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.05 * scale


def test_calibrate_scales_scan_sites_fall_back():
    """Convs inside an nn.scan body (DRCN's recursion) cannot export
    their amax from the scan trace — calibration must skip them (not
    crash) and the static apply falls back to dynamic scales there."""
    from sr.models.registry import get_spec
    from sr.quant import calibrate_scales
    from sr.utils.config import SRConfig

    spec = get_spec("DRCN")
    cfg = SRConfig(model_name="DRCN", scale_factor=2, num_channels=1,
                   dtype="float32", num_recursions=3)
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    scales = calibrate_scales(model, variables, x, train=False)
    assert scales, "outer conv sites should calibrate"
    assert not any("Scan" in k for k in scales), (
        "scan-body sites must not capture")
    ref = np.asarray(model.apply(variables, x, train=False))
    out = np.asarray(jax.jit(lambda a: quantized_apply(
        model, variables, a, scales=scales, train=False))(x))
    rng_ = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() <= 0.08 * rng_


def test_calibrate_scales_batches_keeps_max():
    from sr.quant import calibrate_scales, calibrate_scales_batches

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    model = Net()
    x1 = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    x2 = 3.0 * jax.random.uniform(jax.random.key(2), (1, 8, 8, 2))
    variables = model.init(jax.random.key(0), x1)
    agg = calibrate_scales_batches(model, variables, [x1, x2])
    only2 = calibrate_scales(model, variables, x2)
    assert set(agg) == set(only2)  # x2 dominates every site
    for k in agg:
        np.testing.assert_allclose(agg[k], only2[k], rtol=1e-7)
    with pytest.raises(ValueError, match="empty"):
        calibrate_scales_batches(model, variables, [])


def test_static_predict_lazy_and_batch_independent():
    """mode='static' calibrates once on the first batch; because the
    scales are then constants, outputs stay independent of co-batched
    traffic (same guarantee the per-sample dynamic path gives)."""
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    model = Net()
    x0 = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
    bright = 2.0 * jax.random.uniform(jax.random.key(2), (1, 8, 8, 2))
    variables = model.init(jax.random.key(0), x0)
    fn = make_quantized_predict(model, variables, mode="static")
    solo = np.asarray(fn(x0))
    paired = np.asarray(fn(jnp.concatenate([x0, bright])))[:1]
    np.testing.assert_array_equal(solo, paired)
    with pytest.raises(ValueError, match="mode"):
        make_quantized_predict(model, variables, mode="per_tensor")


def test_fused_tail_quant_interior_close():
    """int8 body + int8 collapsed affine tail stays close to the exact
    f32 graph in the interior (border band excluded, as for the bf16
    fused tail)."""
    from sr.kernels.fused_tail import make_fused_tail_predict_quant
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", scale_factor=2, num_channels=3,
                   dtype="float32", num_resblocks=2, base_filter=16)
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    fn = make_fused_tail_predict_quant(model, variables)
    out = np.asarray(fn(x))
    ref = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == ref.shape
    m = (7 // 2) * 2  # support//2 * r border band
    rng_ = max(ref.max() - ref.min(), 1e-3)
    err = np.abs((out - ref)[:, m:-m, m:-m]).max() / rng_
    assert err <= 0.05, err


def test_interceptor_padding_eligibility():
    """Bare-int padding quantizes (canonicalized); CIRCULAR safely
    falls through to the f32 path instead of crashing."""
    for pad, expect_int8 in [(1, True), ("CIRCULAR", False)]:
        class Net(nn.Module):
            padding: object

            @nn.compact
            def __call__(self, x, train=False):
                return nn.Conv(4, (3, 3), padding=self.padding)(x)

        model = Net(padding=pad)
        x = jax.random.uniform(jax.random.key(1), (1, 8, 8, 2))
        variables = model.init(jax.random.key(0), x)
        txt = jax.jit(
            lambda a: quantized_apply(model, variables, a)
        ).lower(x).as_text()
        assert ("xi8>" in txt) == expect_int8, pad
        out = np.asarray(quantized_apply(model, variables, x))
        ref = np.asarray(model.apply(variables, x))
        assert out.shape == ref.shape
        if not expect_int8:
            np.testing.assert_array_equal(out, ref)


# -- int8 deconv (VERDICT r3 next #8) ----------------------------------------


@pytest.mark.parametrize("name", ["FSRCNN", "LapSRN"])
def test_quantize_deconv_close_to_f32(name):
    """quantize_deconv=True runs the ConvTranspose tails as int8: the
    full int8 forward stays close to the exact f32 forward, and the
    deconv sites actually switch (outputs differ from conv-only int8)."""
    from sr.models.registry import get_spec
    from sr.quant import quantized_apply
    from sr.utils.config import SRConfig

    spec = get_spec(name)
    cfg = SRConfig(model_name=name, scale_factor=4, num_channels=1,
                   dtype="float32", num_pyramid_convs=2)
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 12, 12, 1), jnp.float32)
    v = model.init(jax.random.key(1), x, train=False)
    exact = np.asarray(model.apply(v, x, train=False))
    q_conv = np.asarray(jax.jit(lambda x: quantized_apply(
        model, v, x, train=False))(x))
    q_all = np.asarray(jax.jit(lambda x: quantized_apply(
        model, v, x, quantize_deconv=True, train=False))(x))
    assert np.abs(q_all - exact).max() < 0.05, np.abs(q_all - exact).max()
    assert (q_all != q_conv).any()  # the deconv path really engaged


def test_quantize_deconv_static_scales_cover_deconv_sites():
    """calibrate_scales records ConvTranspose sites too, and the static
    int8 deconv consumes them (per-channel fold)."""
    from sr.models.registry import get_spec
    from sr.quant import calibrate_scales, quantized_apply
    from sr.utils.config import SRConfig

    spec = get_spec("FSRCNN")
    cfg = SRConfig(model_name="FSRCNN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 10, 10, 1), jnp.float32)
    v = model.init(jax.random.key(1), x, train=False)
    scales = calibrate_scales(model, v, x, train=False)
    deconv_sites = [k for k in scales if "deconv" in k.lower()
                    or "ConvTranspose" in k]
    assert deconv_sites, list(scales)
    exact = np.asarray(model.apply(v, x, train=False))
    q = np.asarray(jax.jit(lambda x: quantized_apply(
        model, v, x, scales=scales, quantize_deconv=True,
        train=False))(x))
    assert np.abs(q - exact).max() < 0.05
