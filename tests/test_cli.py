"""CLI tests: flag parsing, validation, per-model defaults."""

import pytest

from sr.main import check_args, parse_args
from sr.utils.config import SRConfig


def test_reference_flags_parse():
    cfg, (eval_only, *_) = parse_args([
        "--model_name", "ESPCN", "--scale_factor", "2", "--crop_size", "64",
        "--num_epochs", "5", "--batch_size", "16", "--lr", "0.001",
        "--train_dataset", "bsds300", "--test_dataset", "Set5",
        "--data_dir", "/tmp/d", "--save_dir", "/tmp/s",
    ])
    assert cfg.model_name == "ESPCN"
    assert cfg.scale_factor == 2 and cfg.crop_size == 64
    assert cfg.lr == 0.001 and cfg.test_dataset == "Set5"
    assert eval_only is False


def test_model_defaults_applied():
    cfg, _ = parse_args(["--model_name", "EDSR", "--save_dir", "/tmp/s"])
    assert cfg.num_channels == 3  # EDSR default RGB
    cfg, _ = parse_args(["--model_name", "SRCNN", "--save_dir", "/tmp/s"])
    assert cfg.num_channels == 1
    assert cfg.effective_lr == 1e-3  # SRCNN's Adam default


def test_check_args_rejects_bad_crop():
    with pytest.raises(SystemExit):
        check_args(SRConfig(crop_size=65, scale_factor=4, save_dir="/tmp/s"))


def test_check_args_rejects_bad_epochs():
    with pytest.raises(SystemExit):
        check_args(SRConfig(num_epochs=0, save_dir="/tmp/s"))


def test_eval_only_flag():
    _, (eval_only, *_rest) = parse_args(
        ["--model_name", "ESPCN", "--eval_only", "--save_dir", "/tmp/s"]
    )
    assert eval_only is True


def test_export_flag_and_artifact(tmp_path):
    _, (_, _, export, export_torch, *_rest) = parse_args(
        ["--model_name", "ESPCN", "--export", "--save_dir", str(tmp_path)]
    )
    assert export is True and export_torch is False

    # the helper writes a loadable artifact from saved params
    import jax
    import numpy as np

    from sr.export import load_artifact
    from sr.main import export_artifact
    from sr.models.registry import get_spec
    from sr.utils.checkpoint import save_params
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=4,
                   crop_size=32, dtype="float32", save_dir=str(tmp_path))
    spec = get_spec("ESPCN")
    model = spec.make_model(cfg)
    x = jax.numpy.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    run_dir = str(tmp_path / "ESPCN_x4")
    import os

    os.makedirs(run_dir, exist_ok=True)
    save_params(os.path.join(run_dir, "ESPCN_params.npz"),
                variables["params"], variables.get("batch_stats"))
    out = export_artifact(cfg, spec, run_dir)
    fn = load_artifact(out)
    y = fn(np.zeros((2, 8, 8, 1), np.float32))
    assert y.shape == (2, 32, 32, 1)


def test_mesh_flag():
    cfg, _ = parse_args(
        ["--model_name", "ESPCN", "--mesh", "4", "2", "--save_dir", "/tmp/s"]
    )
    assert cfg.mesh_shape == (4, 2)
