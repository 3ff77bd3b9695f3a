"""Scan-of-K-steps training: equivalence with K single steps."""

import jax
import numpy as np

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.train.trainer import Trainer
from sr.utils.config import SRConfig


def _setup(**cfg_kw):
    cfg = SRConfig(model_name="ESPCN", scale_factor=2, crop_size=16,
                   batch_size=8, num_channels=1, dtype="float32",
                   steps_per_epoch=4, **cfg_kw)
    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=16,
                         scale_factor=2, batch_size=8, channels=1,
                         augment=False, random_scale=False)
    tr = Trainer(cfg)
    b0 = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), b0["lr"][:1])
    return tr, state, pipe


def test_multi_step_equals_single_steps():
    """One scan-of-4 == 4 single steps with the same key stream."""
    tr1, s1, pipe = _setup()
    tr2, s2, _ = _setup()
    rng = jax.random.key(5)

    # path A: host loop
    rng_a = rng
    for _ in range(4):
        rng_a, sub = jax.random.split(rng_a)
        s1, m1 = tr1.train_step(s1, pipe(sub))

    # path B: one fused dispatch
    multi = tr2.make_multi_step(pipe, 4)
    s2, rng_b, m2 = multi(s2, rng, pipe.bank)

    assert int(s1.step) == int(s2.step) == 4
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(rng_a)),
        np.asarray(jax.random.key_data(rng_b)),
    )


def test_fit_with_steps_per_dispatch():
    tr, state, pipe = _setup(steps_per_dispatch=2, num_epochs=2)
    logs = []
    state = tr.fit(state, pipe, num_epochs=2, steps_per_epoch=4,
                   log_cb=logs.append)
    assert int(state.step) == 8
    assert logs and "loss" in logs[0]


def test_fit_with_non_divisible_dispatch():
    """spe=5, k=2 → 2 scans + 1 single step per epoch."""
    tr, state, pipe = _setup(steps_per_dispatch=2)
    state = tr.fit(state, pipe, num_epochs=1, steps_per_epoch=5)
    assert int(state.step) == 5
