"""shuffle_fold: conv-through-pixel-shuffle phase folding is exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.kernels.depth_to_space import depth_to_space
from sr.kernels.shuffle_fold import (
    d2s_conv,
    fold_bias,
    fold_shuffle_conv_kernel,
)


def _conv(x, w, p):
    return jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), ((p, p), (p, p)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "r,k,c,n", [(2, 3, 4, 5), (2, 9, 2, 3), (4, 3, 3, 2), (4, 9, 2, 3), (3, 3, 2, 2)]
)
def test_d2s_conv_matches_composition(r, k, c, n):
    rng = np.random.default_rng(r * 100 + k)
    x = jnp.asarray(rng.standard_normal((2, 6, 7, c * r * r)), jnp.float32)
    w = rng.standard_normal((k, k, c, n)).astype(np.float32)
    b = rng.standard_normal(n).astype(np.float32)
    ref = _conv(depth_to_space(x, r), w, k // 2) + b
    got = d2s_conv(x, w, r, bias=b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fold_is_composable_across_nested_shuffles():
    """Folding twice moves a conv through d2s(2)∘d2s(2) (the ×4 tail
    structure of SRResNet/EDSR) exactly."""
    rng = np.random.default_rng(0)
    c, n, k = 2, 3, 9
    x = jnp.asarray(rng.standard_normal((1, 5, 6, c * 16)), jnp.float32)
    w = rng.standard_normal((k, k, c, n)).astype(np.float32)

    ref = _conv(depth_to_space(depth_to_space(x, 2), 2), w, k // 2)

    w1, dmin1 = fold_shuffle_conv_kernel(w, 2)  # through the inner d2s
    t1 = w1.shape[0]
    assert -dmin1 == t1 - 1 + dmin1, "odd-k fold stays symmetric"
    w2, dmin2 = fold_shuffle_conv_kernel(w1, 2, padding=-dmin1)
    t2 = w2.shape[0]
    y = _conv(x, w2, -dmin2)
    assert -dmin2 == t2 - 1 + dmin2
    got = depth_to_space(depth_to_space(y, 2), 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_folded_tail_predict_equals_model():
    """SRResNet with the folded output conv ≡ the exact forward,
    borders included (NOT just the interior — unlike fused_tail)."""
    from sr.kernels.shuffle_fold import make_folded_tail_predict
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="SRResNet", num_channels=3, scale_factor=4,
                   num_resblocks=2, dtype="float32")
    model = get_spec("SRResNet").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 12, 12, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    exact = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    )
    folded = np.asarray(make_folded_tail_predict(model, variables)(x))
    np.testing.assert_allclose(folded, exact, atol=2e-5)


@pytest.mark.parametrize("scale", [4, 3])
def test_folded_tail_predict_equals_model_edsr(scale):
    """EDSR (activation-free PS stages, ConvBlock-wrapped out_conv) folds
    exactly too — including the single-stage ×3 tail (r_last=3)."""
    from sr.kernels.shuffle_fold import make_folded_tail_predict
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=scale,
                   num_resblocks=2, dtype="float32")
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 12, 12, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    exact = np.asarray(
        jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    )
    folded = np.asarray(make_folded_tail_predict(model, variables)(x))
    np.testing.assert_allclose(folded, exact, atol=2e-5)


def test_fold_bias_replication():
    b = np.array([1.0, 2.0], np.float32)
    np.testing.assert_array_equal(
        fold_bias(b, 2), [1, 1, 1, 1, 2, 2, 2, 2]
    )


def test_folded_kernel_flop_accounting():
    """T (tap count) matches the derivation: T = dmax - dmin + 1 with
    dmin=floor(-p/r), dmax=floor((r-1+k-1-p)/r)."""
    for r, k in [(2, 3), (2, 9), (4, 9), (4, 3)]:
        w = np.zeros((k, k, 1, 1), np.float32)
        wf, dmin = fold_shuffle_conv_kernel(w, r)
        p = k // 2
        assert dmin == (0 - p) // r
        assert wf.shape[0] == (r - 1 + k - 1 - p) // r - dmin + 1
        assert wf.shape[2] == r * r and wf.shape[3] == r * r


def test_folded_tail_predict_quant_close_and_matches_static():
    """int8-static + phase-folded composite: close to the exact f32
    graph (borders INCLUDED — the fold is exact, only the int8 grid
    differs) and consistent with the exact-graph static-int8 path."""
    from sr.kernels.shuffle_fold import (
        make_folded_tail_predict,
        make_folded_tail_predict_quant,
    )
    from sr.models.registry import get_spec
    from sr.quant import make_quantized_predict
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="SRResNet", num_channels=3, scale_factor=4,
                   num_resblocks=2, dtype="float32")
    model = get_spec("SRResNet").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 12, 12, 3))
    variables = model.init(jax.random.key(1), x, train=False)

    ref = np.asarray(make_folded_tail_predict(model, variables)(x))
    got = np.asarray(make_folded_tail_predict_quant(model, variables)(x))
    assert got.shape == ref.shape
    rng_ = max(ref.max() - ref.min(), 1e-3)
    assert np.abs(got - ref).max() / rng_ <= 0.05

    # the exact-graph static-int8 path quantizes the same sites with the
    # same calibrated scales — the two int8 programs must agree tightly
    # (only the out-conv's weight-quantization grid differs: per-channel
    # over 3 vs 3·r² output channels)
    static = np.asarray(
        make_quantized_predict(model, variables, mode="static")(x))
    assert np.abs(got - static).max() / rng_ <= 0.02


def test_folded_tail_predict_quant_edsr_and_routing():
    """EDSR works through the folded-quant composite too, and
    make_serving_predict routes SRResNet static+fused to it (not to the
    exact graph)."""
    from sr.infer import make_serving_predict
    from sr.kernels.shuffle_fold import make_folded_tail_predict_quant
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=2,
                   num_resblocks=2, dtype="float32")
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 12, 12, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    ref = np.asarray(
        jax.jit(lambda v, a: model.apply(v, a, train=False))(variables, x))
    got = np.asarray(make_folded_tail_predict_quant(model, variables)(x))
    rng_ = max(ref.max() - ref.min(), 1e-3)
    assert np.abs(got - ref).max() / rng_ <= 0.05

    cfg = SRConfig(model_name="SRResNet", num_channels=3, scale_factor=2,
                   num_resblocks=2, dtype="float32")
    model = get_spec("SRResNet").make_model(cfg)
    variables = model.init(jax.random.key(1), x, train=False)
    served = np.asarray(
        make_serving_predict(model, variables, fused=True,
                             quantize="static")(x))
    composite = np.asarray(
        make_folded_tail_predict_quant(model, variables)(x))
    # bit-identical: the serving router must have picked the composite
    np.testing.assert_array_equal(served, composite)
