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
