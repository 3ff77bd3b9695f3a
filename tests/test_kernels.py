"""depth_to_space vs torch.nn.PixelShuffle oracle (SURVEY §4.1)."""

import numpy as np
import pytest

from sr.kernels.depth_to_space import depth_to_space, depth_to_space_ref, space_to_depth


@pytest.mark.parametrize("r", [2, 3, 4])
def test_matches_torch_pixelshuffle(rng, r):
    import torch

    b, h, w, c = 2, 5, 7, 3
    x = rng.standard_normal((b, h, w, c * r * r)).astype(np.float32)
    ours = np.asarray(depth_to_space_ref(x, r))
    # torch is NCHW
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.PixelShuffle(r)(xt).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("r", [2, 4])
def test_space_to_depth_inverts(rng, r):
    x = rng.standard_normal((2, 4, 6, 8 * r * r)).astype(np.float32)
    y = depth_to_space_ref(x, r)
    back = np.asarray(space_to_depth(y, r))
    np.testing.assert_array_equal(back, x)


def test_jit_path_with_relu(rng):
    x = rng.standard_normal((1, 4, 4, 4)).astype(np.float32)
    out = np.asarray(depth_to_space(x, 2, act="relu"))
    ref = np.asarray(depth_to_space_ref(np.maximum(x, 0), 2))
    np.testing.assert_array_equal(out, ref)


def test_pallas_path_interpret(rng):
    """Pallas kernel correctness via interpreter mode (no TPU in tests)."""
    from jax.experimental.pallas import tpu as pltpu

    x = rng.standard_normal((2, 4, 8, 12)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(depth_to_space(x, 2, use_pallas=True))
    ref = np.asarray(depth_to_space_ref(x, 2))
    np.testing.assert_array_equal(out, ref)
