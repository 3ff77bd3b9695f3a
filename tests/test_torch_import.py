"""Reference-checkpoint import: torch state_dict → Flax weights.

The migration path for users of the reference collection: their
``<Model>_param.pkl`` (``torch.save(model.state_dict())`` — reference:
each wrapper's ``save_model``) loads into this framework's models
weight-for-weight. Locked two ways:

* round-trip — randomized Flax weights → ``transplant`` → state_dict →
  ``import_state_dict`` reproduces the original tree exactly (and
  ``transplant`` itself is forward-locked against torch in
  tests/test_torch_parity.py);
* forward — a torch-initialized replica's state_dict imports into Flax
  and both frameworks compute the same function.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flax.traverse_util import flatten_dict

from sr.models.registry import get_spec
from sr.utils.config import SRConfig
from sr.utils.torch_interop import (
    discriminator_plan,
    import_state_dict,
    reference_plan,
    transplant,
)

from sr.utils import torch_refnets as tref
from test_torch_parity import (
    _flax_forward,
    _randomize,
    _setup,
    _torch_forward,
)

# (model_name, channels, cfg overrides, torch replica factory)
CASES = [
    ("SRCNN", 1, {}, lambda: tref.TorchSRCNN()),
    ("VDSR", 1, {}, lambda: tref.TorchVDSR()),
    ("DRCN", 1, {"num_recursions": 4}, lambda: tref.TorchDRCN(depth=4)),
    ("ESPCN", 1, {}, lambda: tref.TorchESPCN()),
    ("FSRCNN", 1, {}, lambda: tref.TorchFSRCNN()),
    ("EDSR", 3, {"num_resblocks": 3, "res_scale": 0.1},
     lambda: tref.TorchEDSR(blocks=3, res_scale=0.1)),
    ("SRResNet", 3, {"num_resblocks": 2},
     lambda: tref.TorchSRResNet(blocks=2)),
    ("LapSRN", 1, {}, lambda: tref.TorchLapSRN()),
]


def _randomize_torch(tnet, seed: int) -> None:
    """Randomize BN running stats (default 0/1 would mask transform bugs)."""
    gen = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0.0, 0.1, generator=gen)
                m.running_var.uniform_(0.5, 1.5, generator=gen)


def _trees_close(a: dict, b: dict) -> None:
    fa, fb = flatten_dict(a), flatten_dict(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_allclose(
            np.asarray(fa[k]), np.asarray(fb[k]), atol=1e-6,
            err_msg="/".join(k))


@pytest.mark.parametrize("name,ch,cfg_kw,make_torch",
                         CASES, ids=[c[0] for c in CASES])
def test_import_roundtrips_transplant(name, ch, cfg_kw, make_torch):
    """import_state_dict(transplant(v)) == v for every zoo topology."""
    model, v, _ = _setup(name, ch, seed=11, **cfg_kw)
    tnet = make_torch()
    plan = reference_plan(name, model)
    if name == "DRCN":  # the bare recursion-weights Parameter (plan[0])
        w = np.asarray(v["params"]["recursion_weights"])
        with torch.no_grad():
            tnet.w.copy_(torch.from_numpy(w))
        transplant(v["params"], None, plan[1:], tnet)
    else:
        transplant(v["params"], v.get("batch_stats"), plan, tnet)
    fresh = _setup(name, ch, seed=99, **cfg_kw)[1]
    got = import_state_dict(tnet.state_dict(), plan, fresh)
    _trees_close(got["params"], v["params"])
    if "batch_stats" in v:
        _trees_close(got["batch_stats"], v["batch_stats"])


_FWD = [c for c in CASES if c[0] in ("SRResNet", "FSRCNN", "DRCN")]


@pytest.mark.parametrize("name,ch,cfg_kw,make_torch", _FWD,
                         ids=[c[0] for c in _FWD])
def test_import_forward_equals_torch(name, ch, cfg_kw, make_torch):
    """A torch-initialized net's state_dict imports into Flax and both
    compute the same function (conv/bn/prelu/deconv/bare-param atoms)."""
    model, v, x = _setup(name, ch, seed=12, **cfg_kw)
    torch.manual_seed(12)
    tnet = make_torch()
    _randomize_torch(tnet, 12)
    got = import_state_dict(tnet.state_dict(),
                            reference_plan(name, model), v)
    np.testing.assert_allclose(
        _flax_forward(model, got, x), _torch_forward(tnet, x),
        atol=1e-4, rtol=1e-4)


def test_import_discriminator_forward():
    cfg = SRConfig(model_name="SRGAN", num_channels=3, scale_factor=4,
                   dtype="float32")
    model = get_spec("SRGAN").make_discriminator(cfg)
    rng = np.random.default_rng(13)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    v = model.init(jax.random.key(13), jnp.asarray(x), train=False)
    torch.manual_seed(13)
    tnet = tref.TorchDiscriminator(hr_size=32)
    _randomize_torch(tnet, 13)
    got = import_state_dict(tnet.state_dict(), discriminator_plan(32), v)
    ours = np.asarray(jax.jit(
        lambda vv, xx: model.apply(vv, xx, train=False))(got, jnp.asarray(x)))
    tnet.eval()
    with torch.no_grad():
        ref = tnet(torch.from_numpy(
            np.ascontiguousarray(x.transpose(0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_import_rejects_atom_count_mismatch():
    model, v, _ = _setup("SRCNN", 1, seed=14)
    tnet = tref.TorchSRCNN()
    plan = reference_plan("SRCNN", model)
    with pytest.raises(ValueError, match="atoms"):
        import_state_dict(tnet.state_dict(), plan[:-1], v)


def test_compat_loads_reference_pkl(tmp_path):
    """wrapper.load_model() picks up a reference-style
    ``<Model>_param.pkl`` and test-time predictions use its weights."""
    from sr.compat import ESPCN

    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=4,
                   crop_size=32, dtype="float32",
                   save_dir=str(tmp_path))
    torch.manual_seed(15)
    tnet = tref.TorchESPCN()
    run_dir = tmp_path / "ESPCN_x4"
    run_dir.mkdir()
    torch.save(tnet.state_dict(), str(run_dir / "ESPCN_param.pkl"))

    w = ESPCN(cfg)
    assert w.load_model()
    x = np.random.default_rng(15).uniform(
        0, 1, (1, 12, 12, 1)).astype(np.float32)
    ours = np.asarray(w.trainer.make_predict_fn()(
        w.state.params, w.state.batch_stats, jnp.asarray(x)))
    np.testing.assert_allclose(ours, _torch_forward(tnet, x),
                               atol=1e-4, rtol=1e-4)
    os.path.exists(str(run_dir))  # tmp cleanup sanity


@pytest.mark.parametrize("name,ch,cfg_kw,make_torch",
                         CASES, ids=[c[0] for c in CASES])
def test_export_reference_checkpoint_roundtrip(tmp_path, name, ch, cfg_kw,
                                               make_torch):
    """export_reference_checkpoint → load_reference_checkpoint reproduces
    the trained weights exactly (and make_reference_net's topology map
    must agree with reference_plan's atom count for every model)."""
    del make_torch
    from sr.utils.torch_interop import (
        export_reference_checkpoint,
        load_reference_checkpoint,
    )

    model, v, _ = _setup(name, ch, seed=21, **cfg_kw)
    path = str(tmp_path / f"{name}_param.pkl")
    export_reference_checkpoint(name, model, v, path)
    fresh = _setup(name, ch, seed=77, **cfg_kw)[1]
    got = load_reference_checkpoint(name, model, fresh, path)
    _trees_close(got["params"], v["params"])
    if "batch_stats" in v:
        _trees_close(got["batch_stats"], v["batch_stats"])
