"""Model build / forward-shape / param-count tests (SURVEY §4.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.models.registry import available_models, get_spec
from sr.utils.config import SRConfig

SMALL = dict(
    num_resblocks=2, num_recursions=3, num_pyramid_convs=2, dtype="float32"
)


def _cfg(name, scale=4, **kw):
    spec = get_spec(name)
    merged = {**SMALL, **kw}
    return SRConfig(
        model_name=name, scale_factor=scale,
        num_channels=spec.default_channels, **merged,
    ), spec


@pytest.mark.parametrize("name", available_models())
def test_forward_shape(name):
    cfg, spec = _cfg(name)
    model = spec.make_model(cfg)
    r = cfg.scale_factor
    c = cfg.num_channels
    if spec.pre_upsample:
        x = jnp.zeros((2, 32, 32, c))
        want = (2, 32, 32, c)
    else:
        x = jnp.zeros((2, 8, 8, c))
        want = (2, 8 * r, 8 * r, c)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(
        variables, x, train=False,
        **({} if spec.make_discriminator is None else {}),
    )
    assert out.shape == want, (name, out.shape, want)


@pytest.mark.parametrize("name,expected", [
    # hand-derived param counts for the full-size configs
    # SRCNN 9-5-5 1→64→32→1: 64·81+64 + 32·64·25+32 + 1·32·25+1
    ("SRCNN", 64 * 81 + 64 + 32 * 64 * 25 + 32 + 32 * 25 + 1),
    # VDSR 20 layers 3×3 no-bias: 64·9 + 18·(64·64·9) + 64·9
    ("VDSR", 64 * 9 + 18 * 64 * 64 * 9 + 64 * 9),
])
def test_param_counts(name, expected):
    spec = get_spec(name)
    cfg = SRConfig(model_name=name, scale_factor=4,
                   num_channels=spec.default_channels, dtype="float32")
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 16, 16, cfg.num_channels))
    variables = model.init(jax.random.key(0), x, train=False)
    n = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    assert n == expected, (name, n, expected)


def test_fsrcnn_param_count_matches_paper_scale():
    """FSRCNN(56,12,4) should be ~12-13k params (paper: 12,464 core)."""
    spec = get_spec("FSRCNN")
    cfg = SRConfig(model_name="FSRCNN", scale_factor=4, num_channels=1, dtype="float32")
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    n = sum(int(p.size) for p in jax.tree.leaves(variables["params"]))
    assert 11000 < n < 14000, n


def test_vdsr_is_residual():
    """Zero-init final layers → VDSR output ≈ input (global skip)."""
    spec = get_spec("VDSR")
    cfg, spec = _cfg("VDSR")
    model = spec.make_model(cfg)
    x = jnp.ones((1, 16, 16, 1)) * 0.5
    variables = model.init(jax.random.key(0), x, train=False)
    # force last conv kernel to zero: output must equal input exactly
    params = variables["params"]
    leaves = jax.tree.leaves(params)
    zeroed = jax.tree.map(lambda p: jnp.zeros_like(p), params)
    out = model.apply({"params": zeroed}, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x))


def test_drcn_train_returns_recursions():
    cfg, spec = _cfg("DRCN")
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    final, ys = model.apply(variables, x, train=True)
    assert ys.shape == (cfg.num_recursions, 1, 16, 16, 1)
    assert final.shape == (1, 16, 16, 1)


def test_drcn_eval_equals_stacked_ensemble():
    """The O(1)-memory eval accumulation ≡ the explicit weighted ensemble
    over the train path's stacked per-recursion predictions (VERDICT r2
    #5: eval must not stack D full-resolution tensors)."""
    cfg, spec = _cfg("DRCN")
    model = spec.make_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (2, 16, 16, 1)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    final, ys = model.apply(variables, x, train=True)
    ev = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(final))
    w = np.asarray(variables["params"]["recursion_weights"])
    w = w / w.sum()
    manual = np.einsum("d,dbhwc->bhwc", w, np.asarray(ys))
    np.testing.assert_allclose(np.asarray(ev), manual, atol=1e-6)


def test_lapsrn_pyramid_outputs():
    cfg, spec = _cfg("LapSRN", scale=4)
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    outs = model.apply(variables, x, train=True)
    assert len(outs) == 2
    assert outs[0].shape == (1, 16, 16, 1)
    assert outs[1].shape == (1, 32, 32, 1)


def test_discriminator_logits_shape():
    cfg, spec = _cfg("SRGAN")
    d = spec.make_discriminator(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    variables = d.init(jax.random.key(0), x, train=False)
    out = d.apply(variables, x, train=False)
    assert out.shape == (2, 1)


@pytest.mark.parametrize("scale", [2, 3, 4])
def test_espcn_scales(scale):
    cfg, spec = _cfg("ESPCN", scale=scale)
    model = spec.make_model(cfg)
    x = jnp.zeros((1, 8, 8, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 8 * scale, 8 * scale, 1)
