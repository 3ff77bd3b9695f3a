"""Scan-fused GAN phases: equivalence with single steps."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.train.gan import GANTrainer
from sr.utils.config import SRConfig


@pytest.fixture(scope="module")
def setup():
    def make(spd=1):
        cfg = SRConfig(model_name="SRGAN", scale_factor=4, crop_size=32,
                       batch_size=8, num_channels=3, dtype="float32",
                       num_resblocks=2, steps_per_epoch=2,
                       pretrain_epochs=1, steps_per_dispatch=spd)
        ds = SyntheticDataset(num_images=2, size=(64, 64), channels=3)
        pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32,
                             scale_factor=4, batch_size=8, channels=3,
                             augment=False, random_scale=False)
        tr = GANTrainer(cfg)
        b = pipe(jax.random.key(0))
        g, d = tr.init_states(jax.random.key(1), b["lr"][:1], b["hr"][:1])
        return tr, g, d, pipe

    return make


def test_adversarial_scan_equals_single(setup):
    make = setup
    tr1, g1, d1, pipe = make()
    tr2, g2, d2, _ = make()
    rng = jax.random.key(9)

    rng_a = rng
    for _ in range(2):
        rng_a, sub = jax.random.split(rng_a)
        g1, d1, m1 = tr1.adversarial_step(g1, d1, pipe(sub))

    multi = tr2.make_multi_step(pipe, 2, "adversarial")
    g2, d2, rng_b, m2 = multi(g2.replace(rng=None), d2, rng, pipe.bank)

    # NOTE: Adam normalizes per-element by sqrt(v)+eps, so when early
    # gradients are near zero the update direction amplifies femto-scale
    # compilation-order differences to O(lr) deltas — bit-equality across
    # different XLA programs is not a sound contract here (the plain-MSE
    # trainer's scan IS bit-checked in test_multistep.py). Contract:
    # same steps, finite losses, same key stream, params in the same
    # neighborhood (<< any training signal).
    assert int(g1.step) == int(g2.step) == 2
    assert int(d1.step) == int(d2.step) == 2
    assert np.isfinite(float(m2["g_loss"])) and np.isfinite(float(m2["d_loss"]))
    for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
    for a, b in zip(jax.tree.leaves(d1.params), jax.tree.leaves(d2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_fit_scan_fused_two_phases(setup):
    make = setup
    tr, g, d, pipe = make(spd=2)
    logs = []
    g, d = tr.fit(g, d, pipe, num_epochs=2, steps_per_epoch=2,
                  pretrain_epochs=1, log_cb=logs.append)
    assert int(g.step) == 4
    assert {l["phase"] for l in logs} == {"pretrain", "adversarial"}
