"""Shared-trainer integration tests (SURVEY §4.3): overfit a single patch."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.models.registry import available_models, get_spec
from sr.train.trainer import Trainer
from sr.utils.config import SRConfig

SMALL = dict(num_resblocks=2, num_recursions=3, num_pyramid_convs=2,
             dtype="float32", steps_per_epoch=4)


def _setup(name, steps=30, **kw):
    spec = get_spec(name)
    cfg = SRConfig(model_name=name, scale_factor=4, crop_size=32, batch_size=8,
                   num_channels=spec.default_channels, **{**SMALL, **kw})
    ds = SyntheticDataset(num_images=2, size=(64, 64),
                          channels=spec.default_channels, seed=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32, scale_factor=4,
                         batch_size=8, channels=spec.default_channels,
                         pre_upsample=spec.pre_upsample,
                         augment=False, random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch[spec.input_key()][:1])
    return tr, state, batch, spec


@pytest.mark.parametrize("name", [m for m in available_models() if m != "srgan"])
def test_loss_decreases_on_fixed_batch(name):
    steps = 25
    lr_override = {"vdsr": 0.01}.get(name)  # full VDSR recipe needs epochs
    tr, state, batch, spec = _setup(
        name, **({"lr": lr_override} if lr_override else {})
    )
    first = None
    last = None
    for i in range(steps):
        state, m = tr.train_step(state, batch)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first, (name, first, last)


def test_predict_improves_psnr_over_training():
    """SRCNN on one fixed batch: post-training PSNR > initial PSNR."""
    from sr.eval.metrics import psnr

    tr, state, batch, spec = _setup("SRCNN")
    x = batch["bc"]
    hr = np.asarray(batch["hr"]) * 255.0

    before = psnr(np.asarray(tr.predict(state, x)) * 255.0, hr)
    for _ in range(60):
        state, _ = tr.train_step(state, batch)
    after = psnr(np.asarray(tr.predict(state, x)) * 255.0, hr)
    assert after > before


def test_state_step_advances():
    tr, state, batch, _ = _setup("ESPCN")
    assert int(state.step) == 0
    state, _ = tr.train_step(state, batch)
    state, _ = tr.train_step(state, batch)
    assert int(state.step) == 2


def test_fit_runs_epochs():
    spec = get_spec("ESPCN")
    cfg = SRConfig(model_name="ESPCN", scale_factor=4, crop_size=32, batch_size=8,
                   num_channels=1, num_epochs=2, **SMALL)
    ds = SyntheticDataset(num_images=2, size=(64, 64), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32, scale_factor=4,
                         batch_size=8, channels=1, augment=False,
                         random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch["lr"][:1])
    logs = []
    state = tr.fit(state, pipe, num_epochs=2, steps_per_epoch=4,
                   log_cb=logs.append)
    assert int(state.step) == 8
    assert logs and "loss" in logs[0]
