"""Fused Pallas resblock vs the flax ResnetBlock oracle (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.kernels.fused_resblock import fused_resblock, pack_weights
from sr.nn.blocks import ResnetBlock


def _setup(c=64, h=32, w=32, b=2, res_scale=1.0):
    blk = ResnetBlock(c, 3, act="relu", norm=None, res_scale=res_scale)
    x = jax.random.uniform(jax.random.key(0), (b, h, w, c), jnp.float32)
    variables = blk.init(jax.random.key(1), x, train=False)
    p = variables["params"]
    w1, b1, w2, b2 = pack_weights(
        p["Conv_0"]["kernel"], p["Conv_0"]["bias"],
        p["Conv_1"]["kernel"], p["Conv_1"]["bias"],
    )
    want = blk.apply(variables, x, train=False)
    return x, (w1, b1, w2, b2), np.asarray(want)


@pytest.mark.parametrize("res_scale", [1.0, 0.1])
def test_matches_flax_resblock(res_scale):
    x, ws, want = _setup(res_scale=res_scale)
    got = np.asarray(
        fused_resblock(x, *ws, row_tile=16, res_scale=res_scale,
                       interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_non_square_and_tile_sizes():
    x, ws, want = _setup(h=48, w=24)
    for tile in (8, 16, 48):
        got = np.asarray(fused_resblock(x, *ws, row_tile=tile, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rejects_bad_tile():
    x, ws, _ = _setup(h=32)
    with pytest.raises(AssertionError):
        fused_resblock(x, *ws, row_tile=7, interpret=True)
