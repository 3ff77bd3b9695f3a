"""Multi-scale (VDSR-style ×2/×3/×4) pipeline + training tests."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.kernels.bicubic import pil_resize_exact_u8
from sr.train.trainer import Trainer
from sr.utils.config import SRConfig


def _images(c=1):
    ds = SyntheticDataset(num_images=2, size=(64, 64), channels=c)
    return [ds[i] for i in range(2)]


def test_multiscale_batch_shapes():
    pipe = PatchPipeline(_images(), crop_size=24, scale_factor=4,
                         batch_size=8, channels=1, pre_upsample=True,
                         scale_factors=(2, 3, 4), augment=False,
                         random_scale=False)
    b = pipe(jax.random.key(0))
    assert set(b) == {"hr", "bc"}
    assert b["hr"].shape == b["bc"].shape == (8, 24, 24, 1)


def test_multiscale_mixes_degradations():
    """Across a batch, bc comes from different downscale factors."""
    pipe = PatchPipeline(_images(), crop_size=24, scale_factor=4,
                         batch_size=16, channels=1, pre_upsample=True,
                         scale_factors=(2, 4), augment=False,
                         random_scale=False)
    b = pipe(jax.random.key(1))
    hr = np.round(np.asarray(b["hr"]) * 255).astype(np.uint8)
    bc = np.asarray(b["bc"]) * 255.0
    matches = {2: 0, 4: 0}
    for i in range(16):
        for r in (2, 4):
            lr = pil_resize_exact_u8(hr[i], (24 // r, 24 // r))
            ref = pil_resize_exact_u8(lr, (24, 24)).astype(np.float64)
            if np.abs(bc[i] - ref).max() < 3.0:
                matches[r] += 1
    assert matches[2] > 0 and matches[4] > 0, matches


def test_multiscale_requires_pre_upsample():
    with pytest.raises(ValueError, match="pre_upsample"):
        PatchPipeline(_images(), crop_size=24, scale_factor=4, batch_size=4,
                      channels=1, pre_upsample=False, scale_factors=(2, 4))


def test_vdsr_trains_multiscale():
    cfg = SRConfig(model_name="VDSR", scale_factor=4, crop_size=24,
                   batch_size=8, num_channels=1, dtype="float32",
                   steps_per_epoch=2, lr=0.01)
    pipe = PatchPipeline(_images(), crop_size=24, scale_factor=4,
                         batch_size=8, channels=1, pre_upsample=True,
                         scale_factors=(2, 3, 4), augment=False,
                         random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch["bc"][:1])
    first = last = None
    for i in range(10):
        state, m = tr.train_step(state, batch)
        first = first if first is not None else float(m["loss"])
        last = float(m["loss"])
    assert last < first
