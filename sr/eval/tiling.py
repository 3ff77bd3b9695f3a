"""Tiled / sharded large-image inference (SURVEY §5 'long-context' row).

Full-image ×4 inference memory scales with H·W; the reference just runs
full images at batch 1 and hopes they fit. Two TPU-native strategies:

  * :func:`tiled_predict` — split the LR image into overlapping tiles
    (halo = the network's receptive field), run each tile, crop the halo
    from the outputs and stitch. Tiles are processed in fixed-size
    batches of ``max_tiles_per_call`` (static shapes, one compile) —
    activation memory is bounded by the chunk size regardless of image
    area, and the result is exactly equal to the full-image forward
    when ``halo ≥ receptive field``.

  * :func:`sharded_predict` — shard the image rows across the mesh's
    'spatial' axis with GSPMD; XLA inserts conv halo exchanges over ICI
    automatically. One jit, collective communication instead of halos in
    host code. (The CNN analogue of sequence/context parallelism.)
"""

from __future__ import annotations

import math
import weakref

import jax
import jax.numpy as jnp
import numpy as np

#: conservative per-model LR-space receptive-field half-widths
RECEPTIVE_FIELD = {
    "srcnn": 8,       # (9+5+5-3)//2
    "espcn": 5,       # (5+3+3-3)//2
    "fsrcnn": 12,
    "vdsr": 20,       # 20 3×3 convs
    "drcn": 22,
    "edsr": 40,       # 16 resblocks ×2 convs + head/tail
    "srresnet": 44,
    "srgan": 44,
    "lapsrn": 32,
}


def tiled_predict(
    predict_fn,
    x: jax.Array,
    scale_factor: int,
    tile: int = 128,
    halo: int = 32,
    max_tiles_per_call: int = 16,
    fixed_chunk: bool = False,
):
    """Run ``predict_fn`` over overlapping tiles of NHWC ``x`` and stitch.

    ``x``: (1, H, W, C) LR input (pre-upsample models: pass the upsampled
    input with scale_factor=1). All tiles share one static window shape,
    and every device call carries at most ``max_tiles_per_call`` tiles
    (the last chunk is padded by repeating its final tile) → ONE
    compilation and activation memory bounded by the chunk, independent
    of image area.

    ``fixed_chunk``: pad EVERY call to exactly ``max_tiles_per_call``
    tiles, so images with different tile counts share one compiled batch
    shape (the shape-bucketed eval path — O(1) compiles for a whole
    mixed-size dataset, as long as every image is at least window-sized).

    Windows are CLAMPED to the image (flush at the edges, never padded):
    an output pixel's receptive field either lies over real pixels inside
    the window, or crosses the true image edge exactly where the window
    is flush with it — so the network's own 'SAME' padding applies as in
    the full-image forward. With ``halo ≥`` the model's receptive field
    (see RECEPTIVE_FIELD) the stitched result is numerically IDENTICAL to
    the full forward.
    """
    assert x.ndim == 4 and x.shape[0] == 1, "tiled_predict takes batch 1"
    _, h, w, c = x.shape
    r = scale_factor
    win_h = min(tile + 2 * halo, h)
    win_w = min(tile + 2 * halo, w)
    if h <= win_h and w <= win_w:
        return predict_fn(x)

    ny, nx = math.ceil(h / tile), math.ceil(w / tile)
    slices, crops = [], []
    for iy in range(ny):
        y0 = iy * tile
        y1 = min(y0 + tile, h)
        sy = min(max(y0 - halo, 0), h - win_h)
        for ix in range(nx):
            x0 = ix * tile
            x1 = min(x0 + tile, w)
            sx = min(max(x0 - halo, 0), w - win_w)
            slices.append((sy, sx))
            crops.append((y0 - sy, x0 - sx, y1 - y0, x1 - x0))

    # Dispatch-count note (round-4 review): the per-tile dynamic_slice /
    # per-chunk concatenate below run EAGERLY — ~2 small dispatches per
    # tile on top of the n/chunk predict calls. Deliberate: jitting the
    # gather/stitch would key fresh compiles on every distinct image
    # size (starts-count and canvas shapes change per image), breaking
    # the O(1)-compile guarantee for mixed-size datasets — and remote
    # compiles here cost 40-200 s while an eager dispatch costs ~25 ms.
    # Geometry-stable large-image serving that wants fewer dispatches
    # should batch at a higher level (multi-bucket artifacts).
    n = len(slices)
    chunk = max_tiles_per_call if fixed_chunk else max(1, min(max_tiles_per_call, n))
    outs = []
    for start in range(0, n, chunk):
        group = slices[start : start + chunk]
        tiles = [
            jax.lax.dynamic_slice(x, (0, sy, sx, 0), (1, win_h, win_w, c))
            for sy, sx in group
        ]
        # keep every call at the same static batch shape (one compile)
        tiles.extend([tiles[-1]] * (chunk - len(group)))
        out = predict_fn(jnp.concatenate(tiles, axis=0))
        outs.extend(out[i] for i in range(len(group)))

    rows = []
    for iy in range(ny):
        row = []
        for ix in range(nx):
            k = iy * nx + ix
            oy, ox, th, tw = crops[k]
            row.append(
                outs[k][oy * r : (oy + th) * r, ox * r : (ox + tw) * r, :]
            )
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0)[None]


# jitted sharded closures, weakly keyed so entries die with their owner.
# Two traps this design dodges (round-4 review findings):
#   * bound methods (trainer.predict) are EPHEMERAL — a fresh object per
#     attribute access — so the weak key must be the method's __self__
#     (stable, long-lived), not the method object, or entries die with
#     the temporary;
#   * the cached closure must hold predict_fn only WEAKLY: a strong
#     capture creates a value→key chain inside the WeakKeyDictionary
#     that keeps every key reachable forever (immortal entries — the
#     exact unbounded growth the weak keying is meant to prevent).
_SHARDED_CACHE = weakref.WeakKeyDictionary()
# non-weakref-able callables (e.g. functools.partial) fall back to a
# strong cache: retracing per call would mean one 40-200 s remote
# compile PER IMAGE on a dataset eval in relay environments (ADVICE
# r4). Keyed by id() with the callable held strongly in the value, so
# the id cannot be reused while its entry is alive. FIFO-bounded: a
# caller that constructs a fresh partial PER CALL gets no hits either
# way (each has a new id), and without the bound every such call would
# pin its compiled executable forever.
_SHARDED_CACHE_STRONG: dict = {}
_SHARDED_CACHE_STRONG_MAX = 32


def sharded_predict(predict_fn, x: jax.Array, mesh, axis: str = "spatial"):
    """Whole-image forward with rows sharded over ``axis`` (GSPMD halos).

    ``predict_fn`` must be jittable; the sharding constraint on the input
    rows makes XLA partition every conv spatially and insert the halo
    exchanges over ICI. The jitted closure is cached per
    (predict_fn, mesh, axis) — weakly on the fn (or, for bound
    methods, on its instance), so entries are evicted when the owner
    is garbage collected — and repeated calls
    (dataset eval) don't re-trace; shape-keyed compilation then behaves
    like any jit.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    is_method = hasattr(predict_fn, "__self__")
    anchor = predict_fn.__self__ if is_method else predict_fn
    inner_key = (getattr(predict_fn, "__func__", None), mesh, axis)
    try:
        per_fn = _SHARDED_CACHE.setdefault(anchor, {})
        fn_ref = (weakref.WeakMethod(predict_fn) if is_method
                  else weakref.ref(predict_fn))
    except TypeError:  # non-weakref-able callable: strong id-keyed cache
        entry = _SHARDED_CACHE_STRONG.pop(id(predict_fn), None)
        if entry is None:
            entry = (predict_fn, {})
        assert entry[0] is predict_fn  # strong ref pins the id
        # pop/re-insert refreshes recency (LRU, not FIFO — a hot
        # long-lived callable must survive churn inserts; mirrors
        # sr/quant.py _capture_program)
        _SHARDED_CACHE_STRONG[id(predict_fn)] = entry
        while len(_SHARDED_CACHE_STRONG) > _SHARDED_CACHE_STRONG_MAX:
            _SHARDED_CACHE_STRONG.pop(next(iter(_SHARDED_CACHE_STRONG)))
        per_fn, fn_ref = entry[1], (lambda _fn=predict_fn: _fn)
    run = per_fn.get(inner_key)
    if run is None:
        sh = NamedSharding(mesh, P(None, axis))

        @jax.jit
        def run(x):
            fn = fn_ref()
            if fn is None:  # owner died while its cache entry was live
                raise RuntimeError(
                    "sharded_predict: predict_fn was garbage collected")
            x = jax.lax.with_sharding_constraint(x, sh)
            return jax.lax.with_sharding_constraint(fn(x), sh)

        per_fn[inner_key] = run
    return run(x)
