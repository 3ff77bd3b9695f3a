"""Multi-device correctness (SURVEY §4.4): sharded step ≡ single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.models.registry import get_spec
from sr.parallel.mesh import make_mesh
from sr.train.trainer import Trainer
from sr.utils.config import SRConfig

SMALL = dict(num_resblocks=2, dtype="float32", steps_per_epoch=2)


def _make(mesh_shape):
    cfg = SRConfig(model_name="ESPCN", scale_factor=2, crop_size=16,
                   batch_size=8, num_channels=1, mesh_shape=mesh_shape,
                   **SMALL)
    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=16,
                         scale_factor=2, batch_size=8, channels=1,
                         augment=False, random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch["lr"][:1])
    return tr, state, batch


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_sharded_equals_single_device():
    """3 steps on an 8-way data mesh == 3 steps on a 1-device mesh."""
    tr8, s8, b8 = _make(())       # default: all 8 devices
    tr1, s1, b1 = _make((1,))     # single device
    np.testing.assert_array_equal(np.asarray(b8["hr"]), np.asarray(b1["hr"]))
    for _ in range(3):
        s8, m8 = tr8.train_step(s8, b8)
        s1, m1 = tr1.train_step(s1, b1)
    assert float(m8["loss"]) == pytest.approx(float(m1["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s8.params), jax.tree.leaves(s1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_grad_allreduce_sees_all_shards():
    """Gradients must aggregate over the whole batch, not one shard:
    two half-batches trained separately differ from the full batch unless
    the allreduce averages over all shards — check the sharded step's
    params match a hand-computed full-batch update."""
    tr, state, batch = _make(())
    # hand-computed single-device full-batch step
    model, spec, cfg = tr.model, tr.spec, tr.cfg

    def loss_fn(params):
        out = model.apply({"params": params}, batch["lr"], train=True)
        return jnp.mean(
            (out.astype(jnp.float32) - batch["hr"].astype(jnp.float32)) ** 2
        )

    grads = jax.grad(loss_fn)(jax.tree.map(np.asarray, state.params))
    expected = jax.tree.map(np.asarray, state.apply_gradients(grads=grads).params)
    s2, _ = tr.train_step(state, batch)
    for a, b in zip(jax.tree.leaves(expected), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    ge.dryrun_multichip(2)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)


def _make_gan(mesh_shape):
    from sr.train.gan import GANTrainer

    cfg = SRConfig(model_name="SRGAN", scale_factor=2, crop_size=16,
                   batch_size=8, num_channels=3, mesh_shape=mesh_shape,
                   num_resblocks=2, dtype="float32", steps_per_epoch=2)
    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=3)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=16,
                         scale_factor=2, batch_size=8, channels=3,
                         augment=False, random_scale=False)
    tr = GANTrainer(cfg)
    batch = pipe(jax.random.key(0))
    g, d = tr.init_states(jax.random.key(1), batch["lr"][:1],
                          batch["hr"][:1])
    return tr, g, d, batch


def test_gan_pretrain_sharded_equals_single_device():
    """The GAN pretrain step (MSE, BN batch stats) produces identical G
    params on an 8-way data mesh and a 1-device mesh — grad psum and
    GSPMD global BN-stat aggregation are correct in the GAN trainer."""
    tr8, g8, _, b8 = _make_gan(())
    tr1, g1, _, b1 = _make_gan((1,))
    np.testing.assert_array_equal(np.asarray(b8["hr"]), np.asarray(b1["hr"]))
    for _ in range(2):
        g8, m8 = tr8.pretrain_step(g8, b8)
        g1, m1 = tr1.pretrain_step(g1, b1)
    assert float(m8["g_content_loss"]) == pytest.approx(
        float(m1["g_content_loss"]), rel=1e-5)
    # Param-by-param equality is ill-posed for conv-BN stacks under
    # Adam: conv biases feeding BN have mathematically ZERO gradient
    # (BN subtracts the mean) and many other grads sit near the float-
    # reduction noise floor, so Adam turns each run's reduction-order
    # noise into full ±lr steps on those tensors. Compare the learned
    # FUNCTION and the BN statistics instead, with tolerances scaled to
    # a few Adam steps (lr=1e-4); a real aggregation bug (wrong mean,
    # missing shard) shifts the loss and outputs by orders more.
    out8 = np.asarray(tr8.predict(g8, b8["lr"]), np.float32)
    out1 = np.asarray(tr1.predict(g1, b1["lr"]), np.float32)
    np.testing.assert_allclose(out8, out1, rtol=1e-3, atol=3e-4)
    for a, b in zip(jax.tree.leaves(g8.batch_stats),
                    jax.tree.leaves(g1.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=3e-4)


def test_gan_adversarial_sharded_loss_trajectory():
    """Adversarial steps on the 8-way mesh track the 1-device run's
    G/D loss trajectory. (Raw param equality is ill-conditioned here:
    Adam amplifies float-reduction noise of near-zero adversarial grads
    to full step size, so the trajectory is the meaningful invariant.)"""
    tr8, g8, d8, b8 = _make_gan(())
    tr1, g1, d1, b1 = _make_gan((1,))
    for step in range(3):
        g8, d8, m8 = tr8.adversarial_step(g8, d8, b8)
        g1, d1, m1 = tr1.adversarial_step(g1, d1, b1)
        assert float(m8["g_loss"]) == pytest.approx(
            float(m1["g_loss"]), rel=2e-3), f"g_loss diverged at step {step}"
        assert float(m8["d_loss"]) == pytest.approx(
            float(m1["d_loss"]), rel=2e-3), f"d_loss diverged at step {step}"
