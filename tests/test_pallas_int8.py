"""Pallas int8 im2col conv (sr/kernels/int8_conv.py) — interpret-mode
bit-exactness vs the XLA int8 conv (int32 accumulation is exact, so
equality is integer-exact, not approximate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.kernels.int8_conv import (
    conv3x3_int8_im2col,
    conv3x3_int8_reference,
)


@pytest.mark.parametrize(
    "B,H,W,C,N",
    [
        (1, 8, 8, 8, 8),
        (2, 16, 12, 8, 16),
        (1, 6, 10, 4, 4),   # H not divisible by 4 strips -> TH=2
        (1, 5, 7, 4, 8),    # odd sizes -> TH=1
    ],
)
def test_im2col_matches_xla_int8_conv(B, H, W, C, N):
    kx, kw = jax.random.split(jax.random.key(0))
    q_x = jax.random.randint(kx, (B, H, W, C), -127, 128, jnp.int8)
    q_w = jax.random.randint(kw, (3, 3, C, N), -127, 128, jnp.int8)
    want = np.asarray(conv3x3_int8_reference(q_x, q_w))
    got = np.asarray(conv3x3_int8_im2col(q_x, q_w, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_bf16_im2col_matches_xla_conv():
    from sr.kernels.int8_conv import conv3x3_bf16_im2col

    kx, kw = jax.random.split(jax.random.key(2))
    x = jax.random.normal(kx, (2, 12, 16, 8), jnp.bfloat16)
    w = jax.random.normal(kw, (3, 3, 8, 8), jnp.bfloat16) * 0.2
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32))
    got = np.asarray(conv3x3_bf16_im2col(x, w, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_quantized_apply_pallas_backend_matches_xla():
    """conv_backend='pallas' routes eligible 3x3 convs through the
    im2col kernel (interpret mode on CPU) and produces the same
    quantized forward as the XLA backend — same q_x/q_w, exact int32
    accumulation, identical rescale."""
    from sr.models.registry import get_spec
    from sr.quant import calibrate_scales, quantized_apply
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", scale_factor=2, num_channels=3,
                   dtype="float32", num_resblocks=2, base_filter=8)
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(1), (1, 10, 12, 3))
    variables = model.init(jax.random.key(0), x, train=False)
    scales = calibrate_scales(model, variables, x, train=False)
    y_xla = np.asarray(quantized_apply(
        model, variables, x, scales=scales, train=False))
    y_pl = np.asarray(quantized_apply(
        model, variables, x, scales=scales, conv_backend="pallas",
        train=False))
    np.testing.assert_allclose(y_pl, y_xla, rtol=1e-6, atol=1e-6)


def test_im2col_saturating_inputs_exact():
    """Extremes: +/-127 everywhere — accumulator reaches 9*C*127*127
    (~5.9e6 at C=64), far inside int32; equality must hold exactly."""
    q_x = jnp.full((1, 8, 8, 16), 127, jnp.int8)
    q_w = jnp.full((3, 3, 16, 8), -127, jnp.int8)
    want = np.asarray(conv3x3_int8_reference(q_x, q_w))
    got = np.asarray(conv3x3_int8_im2col(q_x, q_w, interpret=True))
    np.testing.assert_array_equal(got, want)
