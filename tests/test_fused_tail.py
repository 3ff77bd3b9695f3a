"""Fused affine tail: interior exactness vs the three-stage original."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.kernels.fused_tail import extract_affine_conv, make_fused_tail_predict
from sr.models.registry import get_spec
from sr.utils.config import SRConfig


def _edsr(scale=4, blocks=2):
    cfg = SRConfig(model_name="EDSR", scale_factor=scale, num_channels=3,
                   num_resblocks=blocks, dtype="float32")
    model = get_spec("EDSR").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 40, 40, 3))
    variables = model.init(jax.random.key(1), x[:, :8, :8], train=False)
    return model, variables, x


@pytest.mark.parametrize("scale", [2, 4])
def test_fused_matches_interior(scale):
    model, variables, x = _edsr(scale)
    fused = make_fused_tail_predict(model, variables)
    full = np.asarray(model.apply(variables, x, train=False))
    got = np.asarray(fused(x))
    assert got.shape == full.shape
    m = 4 * scale  # border band: S//2(=3) LR px ≤ 4 LR px margin
    np.testing.assert_allclose(
        got[:, m:-m, m:-m, :], full[:, m:-m, m:-m, :], rtol=1e-4, atol=1e-4
    )


def test_extraction_detects_nonaffine():
    """A tail with a ReLU is not affine — extraction must refuse."""

    def fake_tail(y):
        up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        return jax.nn.relu(up[..., :3] - 0.2)

    with pytest.raises(ValueError):
        extract_affine_conv(fake_tail, 8, 2, support=3)


def test_extraction_detects_undersized_support():
    """A 9×9 linear tail can't fit a 3×3 composite kernel."""

    k = jax.random.normal(jax.random.key(0), (9, 9, 4, 12)) * 0.1

    def wide_tail(y):
        z = jax.lax.conv_general_dilated(
            y, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        from sr.kernels.depth_to_space import depth_to_space_ref

        return depth_to_space_ref(z, 2)

    with pytest.raises(ValueError, match="support"):
        extract_affine_conv(wide_tail, 4, 2, support=3)


def test_fused_flop_reduction():
    """The composite kernel is genuinely small: S=7, C_out=3·r²."""
    model, variables, _ = _edsr(4)

    def tail_f32(y):
        return model.apply(variables, y, train=False, method="tail")

    K, b = extract_affine_conv(tail_f32, 64, 4)
    assert K.shape == (7, 7, 64, 48)
    assert b.shape == (48,)
    # original tail per LR px: 9·64·256 (PS1) + 4·9·64·256 (PS2@2x)
    # + 16·9·64·3 (out@4x) ≈ 748k MACs; fused: 49·64·48 ≈ 151k MACs
    orig = 9 * 64 * 256 + 4 * 9 * 64 * 256 + 16 * 9 * 64 * 3
    fused = 49 * 64 * 48
    assert fused * 4 < orig
