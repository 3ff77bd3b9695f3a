"""Shared-trainer integration tests (SURVEY §4.3): overfit a single patch."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.models.registry import available_models, get_spec
from sr.train.trainer import Trainer
from sr.utils.config import SRConfig

SMALL = dict(num_resblocks=2, num_recursions=3, num_pyramid_convs=2,
             dtype="float32", steps_per_epoch=4)


def _setup(name, steps=30, **kw):
    spec = get_spec(name)
    cfg = SRConfig(model_name=name, scale_factor=4, crop_size=32, batch_size=8,
                   num_channels=spec.default_channels, **{**SMALL, **kw})
    ds = SyntheticDataset(num_images=2, size=(64, 64),
                          channels=spec.default_channels, seed=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32, scale_factor=4,
                         batch_size=8, channels=spec.default_channels,
                         pre_upsample=spec.pre_upsample,
                         augment=False, random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch[spec.input_key()][:1])
    return tr, state, batch, spec


@pytest.mark.parametrize("name", [m for m in available_models() if m != "srgan"])
def test_loss_decreases_on_fixed_batch(name):
    steps = 25
    lr_override = {"vdsr": 0.01}.get(name)  # full VDSR recipe needs epochs
    tr, state, batch, spec = _setup(
        name, **({"lr": lr_override} if lr_override else {})
    )
    first = None
    last = None
    for i in range(steps):
        state, m = tr.train_step(state, batch)
        if i == 0:
            first = float(m["loss"])
        last = float(m["loss"])
    assert last < first, (name, first, last)


def test_predict_improves_psnr_over_training():
    """SRCNN on one fixed batch: post-training PSNR > initial PSNR."""
    from sr.eval.metrics import psnr

    tr, state, batch, spec = _setup("SRCNN")
    x = batch["bc"]
    hr = np.asarray(batch["hr"]) * 255.0

    before = psnr(np.asarray(tr.predict(state, x)) * 255.0, hr)
    for _ in range(60):
        state, _ = tr.train_step(state, batch)
    after = psnr(np.asarray(tr.predict(state, x)) * 255.0, hr)
    assert after > before


def test_state_step_advances():
    tr, state, batch, _ = _setup("ESPCN")
    assert int(state.step) == 0
    state, _ = tr.train_step(state, batch)
    state, _ = tr.train_step(state, batch)
    assert int(state.step) == 2


def test_fit_runs_epochs():
    spec = get_spec("ESPCN")
    cfg = SRConfig(model_name="ESPCN", scale_factor=4, crop_size=32, batch_size=8,
                   num_channels=1, num_epochs=2, **SMALL)
    ds = SyntheticDataset(num_images=2, size=(64, 64), channels=1)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32, scale_factor=4,
                         batch_size=8, channels=1, augment=False,
                         random_scale=False)
    tr = Trainer(cfg)
    batch = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), batch["lr"][:1])
    logs = []
    state = tr.fit(state, pipe, num_epochs=2, steps_per_epoch=4,
                   log_cb=logs.append)
    assert int(state.step) == 8
    assert logs and "loss" in logs[0]


# -- pre-shuffle training loss (cfg.preshuffle_loss) -------------------------


@pytest.mark.parametrize("name", ["ESPCN", "EDSR"])
def test_preshuffle_loss_step_equivalent(name):
    """One production train_step with preshuffle_loss on vs off from the
    same init/batch: same loss, (numerically) same updated params — the
    mode is a pure perf rewrite (tests/test_train_fold.py proves the
    loss/grad math; this locks the Trainer wiring end-to-end)."""
    tr_a, s_a, batch, _ = _setup(name)
    tr_b, s_b, batch_b, _ = _setup(name, preshuffle_loss=True)
    assert tr_b._preshuffle is not None
    s_a, m_a = tr_a.train_step(s_a, batch)
    s_b, m_b = tr_b.train_step(s_b, batch_b)
    np.testing.assert_allclose(float(m_b["loss"]), float(m_a["loss"]),
                               rtol=1e-6)
    for x, y in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                   rtol=1e-4, atol=1e-6)


def test_preshuffle_loss_refused_without_support():
    """Models without a trailing shuffle (SRCNN) REFUSE the flag —
    the pre-round-5-review behavior (silent ignore) recorded fake 1.0x
    rows in preshuffle A/Bs (see also test_train_fold refusal cases)."""
    import pytest

    with pytest.raises(ValueError, match="no pre-shuffle fold"):
        _setup("SRCNN", preshuffle_loss=True)


# -- fit-loop arithmetic hardening (VERDICT r3 next #7) ----------------------


def _fit_setup(**cfg_kw):
    """ESPCN mini-setup whose pipeline exposes sample_fn (scan-k capable)."""
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


def _leaves_allclose(a, b, rtol=0.0, atol=0.0):
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=rtol, atol=atol)


def test_fit_resume_mid_epoch_exact():
    """A state saved MID-epoch (step % spe != 0, rng threaded) resumes to
    the bit-identical end state of an unkilled run (k=1 path)."""
    tr_a, s_a, pipe = _fit_setup()
    s_a = tr_a.fit(s_a, pipe, num_epochs=2, steps_per_epoch=4)
    assert int(s_a.step) == 8

    # path B: replay fit's exact stream for 3 steps, thread the rng
    # (the contract for mid-epoch saves), then resume
    tr_b, s_b, _ = _fit_setup()
    rng = s_b.rng
    for _ in range(3):
        rng, sub = jax.random.split(rng)
        s_b, _ = tr_b.train_step(s_b, pipe(sub))
    s_b = s_b.replace(rng=rng)
    s_b = tr_b.fit(s_b, pipe, num_epochs=2, steps_per_epoch=4)
    assert int(s_b.step) == 8  # NOT 3 + 8: only remaining steps run
    _leaves_allclose(s_a.params, s_b.params)


def test_fit_resume_mid_epoch_with_scan_k():
    """Resume at a step that is neither an epoch boundary nor a multiple
    of steps_per_dispatch: exact step accounting, equivalent params (scan
    vs single numerics within tolerance)."""
    tr_a, s_a, pipe = _fit_setup(steps_per_dispatch=2)
    s_a = tr_a.fit(s_a, pipe, num_epochs=2, steps_per_epoch=5)
    assert int(s_a.step) == 10

    tr_b, s_b, _ = _fit_setup(steps_per_dispatch=2)
    rng = s_b.rng
    for _ in range(3):  # 3 % 2 != 0 and 3 % 5 != 0
        rng, sub = jax.random.split(rng)
        s_b, _ = tr_b.train_step(s_b, pipe(sub))
    s_b = s_b.replace(rng=rng)
    s_b = tr_b.fit(s_b, pipe, num_epochs=2, steps_per_epoch=5)
    assert int(s_b.step) == 10
    _leaves_allclose(s_a.params, s_b.params, rtol=1e-5, atol=1e-6)


def test_fit_resume_at_completion_is_noop():
    tr, s, pipe = _fit_setup()
    s = tr.fit(s, pipe, num_epochs=1, steps_per_epoch=4)
    before = jax.tree.map(np.asarray, s.params)
    s = tr.fit(s, pipe, num_epochs=1, steps_per_epoch=4)
    assert int(s.step) == 4
    _leaves_allclose(before, s.params)


def test_fit_log_cadence_vs_k():
    """log_every=2 with k=3: dispatch granularity quantizes logging up to
    k — one log per fused dispatch, plus the epoch-end log."""
    tr, s, pipe = _fit_setup(steps_per_dispatch=3, log_every=2)
    logs = []
    s = tr.fit(s, pipe, num_epochs=1, steps_per_epoch=7,
               log_cb=logs.append)
    assert int(s.step) == 7
    # dispatches: k=3 at it=3, k=3 at it=6, single at it=7 (epoch end)
    # cadence max(log_every,k)=3 → logs at it=3,6 and the it>=spe log at 7
    assert len(logs) == 3, [l["step"] for l in logs]


def test_fit_epoch_hook_gets_usable_state():
    """eval_hook receives the POST-donation rebound state: predict and a
    further train_step must both work on it (donation invalidates only
    the consumed input buffers)."""
    tr, s, pipe = _fit_setup(steps_per_dispatch=2)
    seen = []

    def hook(state, epoch):
        out = tr.predict(state, pipe(jax.random.key(9))["lr"])
        seen.append((epoch, int(state.step), float(np.asarray(out).mean())))

    s = tr.fit(s, pipe, num_epochs=2, steps_per_epoch=4, eval_hook=hook)
    assert [e for e, _, _ in seen] == [0, 1]
    assert [st for _, st, _ in seen] == [4, 8]
    assert all(np.isfinite(v) for _, _, v in seen)
    # the returned state is still trainable
    s2, m = tr.train_step(s, pipe(jax.random.key(10)))
    assert np.isfinite(float(m["loss"]))
