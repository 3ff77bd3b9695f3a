"""Checkpoint round-trip: full state equality + resume (SURVEY §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.models.registry import get_spec
from sr.train.trainer import Trainer
from sr.utils.checkpoint import Checkpointer, load_params, save_params
from sr.utils.config import SRConfig


@pytest.fixture
def setup(tmp_path):
    cfg = SRConfig(model_name="ESPCN", scale_factor=2, crop_size=16,
                   batch_size=8, num_channels=1, dtype="float32",
                   steps_per_epoch=2)
    ds = SyntheticDataset(num_images=2, size=(32, 32), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=16,
                         scale_factor=2, batch_size=8, channels=1,
                         augment=False, random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch["lr"][:1])
    return tr, state, batch, tmp_path


def _trees_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_full_state_roundtrip(setup):
    tr, state, batch, tmp = setup
    for _ in range(3):
        state, _ = tr.train_step(state, batch)
    ck = Checkpointer(str(tmp / "ckpt"), keep=2)
    ck.save(state, wait=True)
    restored = ck.restore(tr.init_state(jax.random.key(1), batch["lr"][:1]))
    assert restored is not None
    assert int(restored.step) == 3
    _trees_equal(restored.params, state.params)
    _trees_equal(restored.opt_state, state.opt_state)
    # training continues identically from the restored state
    s1, m1 = tr.train_step(state, batch)
    s2, m2 = tr.train_step(restored, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), abs=1e-7)
    ck.close()


def test_restore_none_when_empty(setup):
    tr, state, batch, tmp = setup
    ck = Checkpointer(str(tmp / "empty"))
    assert ck.restore(state) is None
    ck.close()


def test_keep_last_k(setup):
    tr, state, batch, tmp = setup
    ck = Checkpointer(str(tmp / "k"), keep=2)
    for _ in range(3):
        state, _ = tr.train_step(state, batch)
        ck.save(state, wait=True)
    assert ck.latest_step() == 3
    # restoring an evicted step fails → only last 2 kept
    assert ck.restore(state, step=3) is not None
    ck.close()


def test_params_only_export(setup, tmp_path):
    tr, state, batch, tmp = setup
    path = str(tmp_path / "params.npz")
    save_params(path, state.params)
    params, bs = load_params(path)
    assert bs is None
    _trees_equal(params, state.params)
    # loaded params drive the model identically
    out1 = np.asarray(tr.predict(state, batch["lr"][:2]))
    out2 = np.asarray(
        tr.model.apply({"params": params}, batch["lr"][:2], train=False)
    )
    np.testing.assert_allclose(out1, out2, atol=1e-6)


def test_resume_consistency_guard(setup):
    """A resume with changed steps_per_epoch/pretrain_epochs or topology
    must fail LOUDLY at Checkpointer construction instead of silently
    shifting the epoch schedule (VERDICT r2 weak #7)."""
    from sr.utils.checkpoint import run_meta

    tr, state, batch, tmp = setup
    cfg = SRConfig(model_name="ESPCN", steps_per_epoch=100,
                   pretrain_epochs=10)
    d = str(tmp / "meta_ck")
    ck = Checkpointer(d, meta=run_meta(cfg))
    ck.save(state, wait=True)
    ck.close()

    # same meta: fine
    Checkpointer(d, meta=run_meta(cfg)).close()
    # changed schedule constants: refused
    with pytest.raises(ValueError, match="steps_per_epoch"):
        Checkpointer(d, meta=run_meta(cfg.replace(steps_per_epoch=50)))
    with pytest.raises(ValueError, match="pretrain_epochs"):
        Checkpointer(d, meta=run_meta(cfg.replace(pretrain_epochs=3)))
    # changed topology: refused
    with pytest.raises(ValueError, match="num_resblocks"):
        Checkpointer(d, meta=run_meta(cfg.replace(num_resblocks=8)))
    # --no_resume actually bypasses the check (fresh run, new contract
    # recorded) — the error message's advertised escape hatch
    ck3 = Checkpointer(d, meta=run_meta(cfg.replace(steps_per_epoch=50)),
                       resume=False)
    ck3.close()
    # ...and the NEW meta is now the stored contract
    with pytest.raises(ValueError, match="steps_per_epoch"):
        Checkpointer(d, meta=run_meta(cfg))
    Checkpointer(d, meta=run_meta(cfg.replace(steps_per_epoch=50))).close()

    # empty dir (no checkpoint yet): meta freely (re)writable
    d2 = str(tmp / "meta_empty")
    Checkpointer(d2, meta=run_meta(cfg)).close()
    Checkpointer(d2, meta=run_meta(cfg.replace(steps_per_epoch=7))).close()

    # legacy dir (checkpoints but no run_meta.json): graceful upgrade
    import os
    d3 = str(tmp / "meta_legacy")
    ck3 = Checkpointer(d3)
    ck3.save(state, wait=True)
    ck3.close()
    assert not os.path.exists(os.path.join(d3, "run_meta.json"))
    Checkpointer(d3, meta=run_meta(cfg)).close()
    assert os.path.exists(os.path.join(d3, "run_meta.json"))


def test_drcn_r2_params_migrate_on_load(tmp_path):
    """Round-2 DRCN_params.npz (recon net OUTSIDE the scan) must keep
    loading after the round-3 O(1)-memory rewrite renamed the param
    paths — load_params migrates the layout; weights are identical."""
    cfg = SRConfig(model_name="DRCN", scale_factor=2, num_channels=1,
                   dtype="float32", num_recursions=4, base_filter=8)
    model = get_spec("DRCN").make_model(cfg)
    x = jnp.linspace(0, 1, 12 * 12, dtype=jnp.float32).reshape(1, 12, 12, 1)
    new = model.init(jax.random.key(0), x, train=False)["params"]
    # reconstruct the ROUND-2 tree: Scan_RecStep_0/Conv_0 + top-level
    # ConvBlock_2 (recon1) + Conv_0 (recon2)
    block = new["Scan_RecBlock_0"]
    old = {k: v for k, v in new.items() if k != "Scan_RecBlock_0"}
    old["Scan_RecStep_0"] = {"Conv_0": block["Conv_0"]}
    old["ConvBlock_2"] = block["ConvBlock_0"]
    old["Conv_0"] = block["Conv_1"]
    path = str(tmp_path / "DRCN_params.npz")
    save_params(path, old)
    migrated, bs = load_params(path)
    assert bs is None
    y_new = jax.jit(lambda p: model.apply({"params": p}, x, train=False))(new)
    y_old = jax.jit(lambda p: model.apply({"params": p}, x, train=False))(
        migrated)
    np.testing.assert_array_equal(np.asarray(y_new), np.asarray(y_old))
