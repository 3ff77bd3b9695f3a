"""Reference-API wrapper tests: SRCNN(args).train()/.test() shape."""

import types

import numpy as np
import pytest

import sr.compat as compat


def _args(tmp_path, **kw):
    base = dict(
        train_dataset="synthetic", test_dataset="synthetic",
        save_dir=str(tmp_path), num_epochs=1, steps_per_epoch=2,
        batch_size=8, crop_size=32, scale_factor=4, dtype="float32",
    )
    base.update(kw)
    return types.SimpleNamespace(**{**{k: None for k in (
        "num_channels", "lr", "data_dir", "save_epochs", "test_batch_size",
        "num_threads", "seed",
    )}, **base})


def test_srcnn_reference_flow(tmp_path):
    model = compat.SRCNN(_args(tmp_path))
    losses = model.train()
    assert losses and losses[-1] > 0
    res = model.test()
    assert len(res.images) == 5
    assert np.isfinite(res.avg_psnr_sr)
    # artifacts in the reference's layout
    assert (tmp_path / "SRCNN_x4" / "SRCNN_params.npz").exists()
    assert (tmp_path / "SRCNN_x4" / "loss.png").exists()
    assert (tmp_path / "SRCNN_x4" / "panels").is_dir()


def test_load_model_roundtrip(tmp_path):
    m1 = compat.ESPCN(_args(tmp_path))
    m1.train()
    m2 = compat.ESPCN(_args(tmp_path))
    assert m2.load_model() is True
    r1 = m1.test().avg_psnr_sr
    r2 = m2.test().avg_psnr_sr
    assert r1 == pytest.approx(r2, abs=1e-6)


def test_test_refuses_without_checkpoint(tmp_path):
    m = compat.VDSR(_args(tmp_path))
    with pytest.raises(RuntimeError, match="no trained parameters"):
        m.test()


def test_all_reference_wrappers_exist():
    for name in ("SRCNN", "VDSR", "DRCN", "ESPCN", "FSRCNN", "EDSR",
                 "SRResNet", "LapSRN", "SRGAN"):
        assert hasattr(compat, name)
