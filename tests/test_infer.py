"""One-call upscale API tests."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.infer import upscale
from sr.models.registry import get_spec
from sr.utils.checkpoint import save_params
from sr.utils.config import SRConfig


@pytest.fixture(scope="module")
def espcn_params(tmp_path_factory):
    d = tmp_path_factory.mktemp("params")
    cfg = SRConfig(model_name="ESPCN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(d / "ESPCN_params.npz")
    save_params(path, v["params"])
    return path


def test_upscale_shapes_rgb_input(espcn_params):
    img = SyntheticDataset(1, (48, 40), 3)[0]
    out = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                  dtype="float32", tile=None)
    assert out.shape == (192, 160, 3)
    assert out.dtype == np.uint8


def test_upscale_gray_input(espcn_params):
    img = SyntheticDataset(1, (32, 32), 1)[0][..., 0]
    out = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                  dtype="float32", tile=None)
    assert out.shape == (128, 128, 1)


def test_upscale_tiled_equals_full(espcn_params):
    img = SyntheticDataset(1, (96, 80), 3)[0]
    full = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                   dtype="float32", tile=None)
    tiled = upscale(img, "ESPCN", espcn_params, scale_factor=4,
                    dtype="float32", tile=48)
    np.testing.assert_array_equal(full, tiled)


def test_upscale_pre_upsample_model(tmp_path):
    cfg = SRConfig(model_name="SRCNN", scale_factor=4, num_channels=1,
                   dtype="float32")
    model = get_spec("SRCNN").make_model(cfg)
    v = model.init(jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32),
                   train=False)
    path = str(tmp_path / "SRCNN_params.npz")
    save_params(path, v["params"])
    img = SyntheticDataset(1, (24, 24), 3)[0]
    out = upscale(img, "SRCNN", path, scale_factor=4, dtype="float32",
                  tile=None)
    assert out.shape == (96, 96, 3)
