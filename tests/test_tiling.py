"""Tiled + GSPMD-sharded inference equals the full-image forward."""

import jax
import jax.numpy as jnp
import numpy as np

from sr.eval.tiling import sharded_predict, tiled_predict
from sr.models.registry import get_spec
from sr.parallel.mesh import make_mesh
from sr.utils.config import SRConfig


def _espcn():
    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 96, 80, 1))
    variables = model.init(jax.random.key(1), x[:, :8, :8], train=False)
    fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    return fn, x


def test_tiled_matches_full():
    fn, x = _espcn()
    full = np.asarray(fn(x))
    tiled = np.asarray(tiled_predict(fn, x, scale_factor=2, tile=32, halo=8))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-5)


def test_tiled_small_image_passthrough():
    fn, x = _espcn()
    out = tiled_predict(fn, x[:, :32, :32], scale_factor=2, tile=64, halo=8)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(fn(x[:, :32, :32])), rtol=1e-6
    )


def test_tiled_non_divisible_sizes():
    fn, _ = _espcn()
    x = jax.random.uniform(jax.random.key(2), (1, 70, 54, 1))
    full = np.asarray(fn(x))
    tiled = np.asarray(tiled_predict(fn, x, scale_factor=2, tile=32, halo=8))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, rtol=1e-5, atol=1e-5)


def test_tiled_chunked_matches_unchunked():
    """Fixed-size tile batches (bounded memory) change nothing numerically."""
    fn, x = _espcn()
    full = np.asarray(fn(x))
    chunked = np.asarray(
        tiled_predict(fn, x, scale_factor=2, tile=32, halo=8,
                      max_tiles_per_call=2)
    )
    np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-5)


def test_tiled_single_compile_across_chunks():
    """Padding the last chunk keeps ONE static shape → one trace."""
    traces = []

    @jax.jit
    def fn(x):
        traces.append(x.shape)
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    x = jax.random.uniform(jax.random.key(3), (1, 96, 80, 1))
    tiled_predict(fn, x, scale_factor=2, tile=32, halo=8,
                  max_tiles_per_call=4)
    assert len(set(traces)) == 1, traces


def test_tiled_large_image_capped_batch():
    """2048² smoke test under a small tile cap (memory stays bounded)."""
    @jax.jit
    def fn(x):  # cheap exact ×2 'model': nearest upsample
        return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    x = jax.random.uniform(jax.random.key(4), (1, 2048, 2048, 1))
    out = tiled_predict(fn, x, scale_factor=2, tile=256, halo=8,
                        max_tiles_per_call=4)
    assert out.shape == (1, 4096, 4096, 1)
    # spot-check equality on a corner block against the direct forward
    np.testing.assert_allclose(
        np.asarray(out[:, :64, :64]), np.asarray(fn(x[:, :32, :32])),
        rtol=1e-6,
    )


def test_sharded_predict_matches():
    """Spatially-sharded whole-image forward (GSPMD halo exchange)."""
    fn, x = _espcn()
    mesh = make_mesh((1, 8), ("data", "spatial"))
    full = np.asarray(fn(x))
    out = np.asarray(sharded_predict(fn, x, mesh))
    np.testing.assert_allclose(out, full, rtol=1e-5, atol=1e-5)


def test_sharded_predict_static_int8_matches():
    """Multi-chip int8 serving: the static-scale quantized forward under
    GSPMD row sharding equals its single-device run exactly (int8 conv
    partitioning + halo exchange + constant scales)."""
    from sr.quant import calibrate_scales, quantized_apply

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    x = jax.random.uniform(jax.random.key(0), (1, 96, 80, 1))
    variables = model.init(jax.random.key(1), x[:, :8, :8], train=False)
    scales = calibrate_scales(model, variables, x, train=False)
    fn = jax.jit(lambda z: quantized_apply(model, variables, z,
                                           scales=scales, train=False))
    mesh = make_mesh((1, 8), ("data", "spatial"))
    single = np.asarray(fn(x))
    out = np.asarray(sharded_predict(fn, x, mesh))
    np.testing.assert_allclose(out, single, rtol=1e-6, atol=1e-6)


def test_sharded_cache_evicts_and_reuses():
    """Cache hygiene (round-4 review): (1) entries must actually die
    with their owner — the cached closure may not hold a strong ref
    back to its weak key (value→key chains make entries immortal);
    (2) bound methods must HIT the cache across attribute accesses
    (each access creates a fresh, equal-but-ephemeral method object —
    keying must anchor on __self__)."""
    import gc

    from sr.eval.tiling import _SHARDED_CACHE

    mesh = make_mesh((1, 8), ("data", "spatial"))
    x = jnp.ones((1, 16, 16, 1), jnp.float32)

    class Owner:
        def predict(self, z):
            return z * 2.0

    _SHARDED_CACHE.clear()
    o = Owner()
    np.testing.assert_allclose(
        np.asarray(sharded_predict(o.predict, x, mesh)), 2.0)
    assert len(_SHARDED_CACHE) == 1
    # second access = a fresh bound-method object; must reuse the entry
    inner = next(iter(_SHARDED_CACHE.values()))
    run_before = dict(inner)
    sharded_predict(o.predict, x, mesh)
    assert len(_SHARDED_CACHE) == 1
    assert dict(next(iter(_SHARDED_CACHE.values()))) == run_before
    # owner death must evict (no immortal value->key chain)
    del o
    gc.collect()
    assert len(_SHARDED_CACHE) == 0

    def plain(z):
        return z + 1.0

    np.testing.assert_allclose(
        np.asarray(sharded_predict(plain, x, mesh)), 2.0)
    assert len(_SHARDED_CACHE) == 1
    del plain
    gc.collect()
    assert len(_SHARDED_CACHE) == 0


def test_sharded_cache_strong_lru_recency():
    """Non-weakref-able callables fall back to the bounded strong
    cache; it must be LRU, not FIFO (round-5 review): a hot entry
    touched between churn inserts survives eviction — an evicted hot
    entry would re-pay a 40-200 s remote compile per 32 churn inserts."""
    from sr.eval.tiling import (_SHARDED_CACHE_STRONG,
                                _SHARDED_CACHE_STRONG_MAX)

    mesh = make_mesh((1, 8), ("data", "spatial"))
    x = jnp.ones((1, 16, 16, 1), jnp.float32)

    class NoWeak:  # no __weakref__ slot → weakref.ref raises TypeError
        __slots__ = ("k",)

        def __call__(self, z):
            return z + 1.0

    _SHARDED_CACHE_STRONG.clear()
    hot = NoWeak()
    sharded_predict(hot, x, mesh)
    assert id(hot) in _SHARDED_CACHE_STRONG
    churn = []  # keep alive: ids must stay unique
    for _ in range(_SHARDED_CACHE_STRONG_MAX - 1):
        f = NoWeak()
        churn.append(f)
        sharded_predict(f, x, mesh)
    sharded_predict(hot, x, mesh)  # touch -> most-recent
    for _ in range(_SHARDED_CACHE_STRONG_MAX - 1):
        f = NoWeak()
        churn.append(f)
        sharded_predict(f, x, mesh)
    assert id(hot) in _SHARDED_CACHE_STRONG, "hot entry evicted (FIFO)"
    assert len(_SHARDED_CACHE_STRONG) == _SHARDED_CACHE_STRONG_MAX
    _SHARDED_CACHE_STRONG.clear()
