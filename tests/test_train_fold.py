"""Pre-shuffle training loss (cfg.preshuffle_loss) is EXACT.

The trainer trains tail-shuffle models in pre-shuffle space: the model
emits the pre-shuffle activation, EDSR's out_conv is folded through the
final shuffle in-graph (differentiable scatter, params stay in the
original basis), and the loss compares against space_to_depth(hr). These
tests lock the three claims that make it exact:

  1. the traced fold equals the numpy fold (same scatter);
  2. the pre-shuffle forward is space_to_depth of the normal forward;
  3. loss AND grads match the normal path (the step-equivalence core —
     the Trainer-level A/B lives in tests/test_trainer.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.kernels.depth_to_space import space_to_depth
from sr.kernels.shuffle_fold import (
    fold_shuffle_conv_kernel,
    fold_shuffle_conv_kernel_jnp,
)
from sr.models.registry import get_spec
from sr.utils.config import SRConfig


@pytest.mark.parametrize("r,k", [(2, 3), (3, 3), (4, 3), (2, 9)])
def test_fold_jnp_matches_numpy(r, k):
    rng = np.random.default_rng(r * 10 + k)
    w = rng.standard_normal((k, k, 3, 2)).astype(np.float32)
    wf_np, dmin_np = fold_shuffle_conv_kernel(w, r)
    wf_j, dmin_j = jax.jit(
        lambda w: fold_shuffle_conv_kernel_jnp(w, r)
    )(jnp.asarray(w))
    assert dmin_j == dmin_np
    np.testing.assert_array_equal(np.asarray(wf_j), wf_np)


@pytest.mark.parametrize("r,k,pad", [
    # explicit (incl. asymmetric-origin) paddings — the full-tail
    # training fold re-folds already-folded kernels with the carried
    # padding, so the non-default-pad branch is on the training path
    (2, 3, 0), (2, 3, 2), (3, 3, 0), (4, 5, 1), (2, 2, 1), (8, 3, 1),
])
def test_fold_jnp_matches_numpy_explicit_padding(r, k, pad):
    rng = np.random.default_rng(r * 100 + k * 10 + pad)
    w = rng.standard_normal((k, k, 2, 3)).astype(np.float32)
    wf_np, dmin_np = fold_shuffle_conv_kernel(w, r, pad)
    wf_j, dmin_j = jax.jit(
        lambda w: fold_shuffle_conv_kernel_jnp(w, r, pad)
    )(jnp.asarray(w))
    assert dmin_j == dmin_np
    np.testing.assert_array_equal(np.asarray(wf_j), wf_np)


def test_fold_jnp_grad_lands_in_original_basis():
    """d/dW of sum(fold(W)) counts each tap's k²-fold replication across
    phases — i.e. grads flow back through the scatter, one contribution
    per (α,β,dy,dx) placement."""
    r, k = 2, 3
    w = jnp.ones((k, k, 1, 1), jnp.float32)
    g = jax.grad(lambda w: jnp.sum(fold_shuffle_conv_kernel_jnp(w, r)[0]))(w)
    # every (dy,dx) tap is placed exactly once per output phase (r² of them)
    np.testing.assert_array_equal(np.asarray(g), np.full((k, k, 1, 1), r * r))


def _edsr(scale):
    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=scale,
                   num_resblocks=2, dtype="float32")
    spec = get_spec("EDSR")
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 3))
    variables = model.init(jax.random.key(1), x, train=False)
    return spec, model, variables, x


@pytest.mark.parametrize("scale", [4, 3, 2, 8])
def test_edsr_preshuffle_forward_is_s2d_of_forward(scale):
    """apply_pre(v, x) == space_to_depth(model.apply(v, x), r_last) —
    the fold moves the out_conv through the LAST shuffle exactly, all
    stage structures (×2 single, ×3 r=3, ×4 two-stage, ×8 three-stage)."""
    spec, model, variables, x = _edsr(scale)
    apply_pre, r_last = spec.preshuffle_train(model)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=True))(variables, x)
    got = jax.jit(apply_pre)(variables, x)
    assert got.shape == space_to_depth(ref, r_last).shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(space_to_depth(ref, r_last)), atol=2e-5
    )


@pytest.mark.parametrize("scale", [4, 3, 2, 8])
def test_edsr_full_fold_forward_is_s2d_chain_of_forward(scale):
    """FULL-tail fold (cfg.preshuffle_loss='full'): apply_fn(v, x) ==
    target_fn(model.apply(v, x)) with the output at LR resolution and
    C·r² channels — every tail conv folded through every shuffle, exact
    at every scale's stage structure including borders."""
    spec, model, variables, x = _edsr(scale)
    apply_full, target_fn = spec.preshuffle_train_full(model)
    ref = jax.jit(lambda v, x: model.apply(v, x, train=True))(variables, x)
    got = jax.jit(apply_full)(variables, x)
    want = target_fn(ref)
    assert got.shape == (2, 8, 8, 3 * scale * scale)
    assert got.shape == want.shape
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=3e-5
    )


@pytest.mark.parametrize("scale", [4, 8])
def test_edsr_full_fold_loss_and_grads_match(scale):
    """Full-fold step-equivalence: same L1 value and same param grads as
    the normal path (each fold step is border-exact and the loss is a
    permutation-invariant mean over the SAME set of elements)."""
    spec, model, variables, x = _edsr(scale)
    apply_full, target_fn = spec.preshuffle_train_full(model)
    hr = jax.random.uniform(
        jax.random.key(2), (2, 8 * scale, 8 * scale, 3)
    )
    hr_pre = target_fn(hr)

    def loss_normal(params):
        out = model.apply({"params": params}, x, train=True)
        return jnp.mean(jnp.abs(out - hr))

    def loss_full(params):
        out = apply_full({"params": params}, x, train=True)
        return jnp.mean(jnp.abs(out - hr_pre))

    params = variables["params"]
    l_n, g_n = jax.jit(jax.value_and_grad(loss_normal))(params)
    l_f, g_f = jax.jit(jax.value_and_grad(loss_full))(params)
    np.testing.assert_allclose(float(l_f), float(l_n), rtol=1e-6)
    flat_n = jax.tree_util.tree_leaves_with_path(g_n)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    for (path_n, a), (path_f, b) in zip(flat_n, flat_f):
        assert path_n == path_f
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path_n),
        )


def test_trainer_full_fold_step_equivalence():
    """Trainer-level A/B: one fit epoch with preshuffle_loss='full'
    lands on the same params as the normal path (donation-safe)."""
    from sr.data.pipeline import PatchPipeline
    from sr.train.trainer import Trainer

    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (48, 48, 3), np.uint8) for _ in range(2)]
    kw = dict(model_name="EDSR", num_channels=3, scale_factor=4,
              num_resblocks=2, crop_size=16, batch_size=4,
              steps_per_epoch=3, num_epochs=1, dtype="float32")
    states = {}
    for mode in (False, "full"):
        cfg = SRConfig(**kw, preshuffle_loss=mode)
        pipe = PatchPipeline(imgs, crop_size=16, scale_factor=4,
                             batch_size=4, channels=3, random_scale=False)
        tr = Trainer(cfg)
        b0 = pipe(jax.random.key(0))
        state = tr.init_state(jax.random.key(1), b0["lr"][:1])
        states[mode] = tr.fit(state, pipe)
    for a, b in zip(jax.tree.leaves(states[False].params),
                    jax.tree.leaves(states["full"].params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-6)


def test_espcn_preshuffle_forward_is_s2d_of_forward():
    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=3,
                   dtype="float32")
    spec = get_spec("ESPCN")
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 1))
    variables = model.init(jax.random.key(1), x, train=False)
    apply_pre, r_last = spec.preshuffle_train(model)
    assert r_last == 3
    ref = jax.jit(lambda v, x: model.apply(v, x, train=True))(variables, x)
    got = jax.jit(apply_pre)(variables, x)
    np.testing.assert_array_equal(  # no fold needed → bit-equal
        np.asarray(got), np.asarray(space_to_depth(ref, r_last))
    )


@pytest.mark.parametrize("scale", [4, 3])
def test_edsr_preshuffle_loss_and_grads_match(scale):
    """The step-equivalence core: L1 in pre-shuffle space has the SAME
    value and the SAME param gradients as the normal path (permutation-
    invariant mean + exact fold + collision-free scatter transpose)."""
    spec, model, variables, x = _edsr(scale)
    apply_pre, r_last = spec.preshuffle_train(model)
    hr = jax.random.uniform(
        jax.random.key(2), (2, 8 * scale, 8 * scale, 3)
    )
    hr_pre = space_to_depth(hr, r_last)

    def loss_normal(params):
        out = model.apply({"params": params}, x, train=True)
        return jnp.mean(jnp.abs(out - hr))

    def loss_pre(params):
        out = apply_pre({"params": params}, x, train=True)
        return jnp.mean(jnp.abs(out - hr_pre))

    params = variables["params"]
    l_n, g_n = jax.jit(jax.value_and_grad(loss_normal))(params)
    l_p, g_p = jax.jit(jax.value_and_grad(loss_pre))(params)
    np.testing.assert_allclose(float(l_p), float(l_n), rtol=1e-6)
    flat_n = jax.tree_util.tree_leaves_with_path(g_n)
    flat_p = jax.tree_util.tree_leaves_with_path(g_p)
    for (path_n, a), (path_p, b) in zip(flat_n, flat_p):
        assert path_n == path_p
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path_n),
        )


def test_espcn_preshuffle_loss_and_grads_match():
    cfg = SRConfig(model_name="ESPCN", num_channels=1, scale_factor=4,
                   dtype="float32")
    spec = get_spec("ESPCN")
    model = spec.make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (2, 8, 8, 1))
    variables = model.init(jax.random.key(1), x, train=False)
    apply_pre, r_last = spec.preshuffle_train(model)
    hr = jax.random.uniform(jax.random.key(2), (2, 32, 32, 1))
    hr_pre = space_to_depth(hr, r_last)

    def loss_normal(params):
        out = model.apply({"params": params}, x, train=True)
        return jnp.mean((out - hr) ** 2)

    def loss_pre(params):
        out = apply_pre({"params": params}, x, train=True)
        return jnp.mean((out - hr_pre) ** 2)

    params = variables["params"]
    l_n, g_n = jax.jit(jax.value_and_grad(loss_normal))(params)
    l_p, g_p = jax.jit(jax.value_and_grad(loss_pre))(params)
    np.testing.assert_allclose(float(l_p), float(l_n), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_n), jax.tree.leaves(g_p)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("model,mode,frag", [
    ("FSRCNN", "last", "no pre-shuffle fold"),   # no hooks at all
    ("FSRCNN", "full", "no pre-shuffle fold"),
    ("ESPCN", "full", "no full-tail fold"),      # has 'last' only
])
def test_preshuffle_loss_refuses_ineligible(model, mode, frag):
    """Requesting a preshuffle mode the spec cannot honor must REFUSE,
    not silently fall back — a silent fallback records fake 1.0x rows
    in any preshuffle A/B (round-5 review finding)."""
    from sr.train.trainer import Trainer

    cfg = SRConfig(model_name=model, num_channels=1, scale_factor=4,
                   preshuffle_loss=mode, dtype="float32")
    with pytest.raises(ValueError, match=frag):
        Trainer(cfg)
