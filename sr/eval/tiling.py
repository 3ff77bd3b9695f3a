"""Tiled / sharded large-image inference (SURVEY §5 'long-context' row).

Full-image ×4 inference memory scales with H·W; the reference just runs
full images at batch 1 and hopes they fit. Two TPU-native strategies:

  * :func:`tiled_predict` — split the LR image into overlapping tiles
    (halo = the network's receptive field), run each tile, crop the halo
    from the outputs and stitch. Overlap tiles are batched into ONE
    device call (static shapes, one compile) — bounded memory for
    arbitrarily large images, exact equality with the full-image forward
    when ``halo ≥ receptive field``.

  * :func:`sharded_predict` — shard the image rows across the mesh's
    'spatial' axis with GSPMD; XLA inserts conv halo exchanges over ICI
    automatically. One jit, collective communication instead of halos in
    host code. (The CNN analogue of sequence/context parallelism.)
"""

from __future__ import annotations

import math

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
):
    """Run ``predict_fn`` over overlapping tiles of NHWC ``x`` and stitch.

    ``x``: (1, H, W, C) LR input (pre-upsample models: pass the upsampled
    input with scale_factor=1). All tiles share one static window shape →
    one compilation, one batched call.

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
    tiles, crops = [], []
    for iy in range(ny):
        y0 = iy * tile
        y1 = min(y0 + tile, h)
        sy = min(max(y0 - halo, 0), h - win_h)
        for ix in range(nx):
            x0 = ix * tile
            x1 = min(x0 + tile, w)
            sx = min(max(x0 - halo, 0), w - win_w)
            tiles.append(
                jax.lax.dynamic_slice(x, (0, sy, sx, 0), (1, win_h, win_w, c))
            )
            crops.append((y0 - sy, x0 - sx, y1 - y0, x1 - x0))
    batch = jnp.concatenate(tiles, axis=0)  # (ny·nx, win_h, win_w, c)
    out = predict_fn(batch)
    rows = []
    for iy in range(ny):
        row = []
        for ix in range(nx):
            k = iy * nx + ix
            oy, ox, th, tw = crops[k]
            row.append(
                out[k, oy * r : (oy + th) * r, ox * r : (ox + tw) * r, :]
            )
        rows.append(jnp.concatenate(row, axis=1))
    return jnp.concatenate(rows, axis=0)[None]


_SHARDED_CACHE: dict = {}


def sharded_predict(predict_fn, x: jax.Array, mesh, axis: str = "spatial"):
    """Whole-image forward with rows sharded over ``axis`` (GSPMD halos).

    ``predict_fn`` must be jittable; the sharding constraint on the input
    rows makes XLA partition every conv spatially and insert the halo
    exchanges over ICI. The jitted closure is cached per
    (predict_fn, mesh, axis) so repeated calls (dataset eval) don't
    re-trace — shape-keyed compilation then behaves like any jit.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = (id(predict_fn), mesh, axis)
    run = _SHARDED_CACHE.get(key)
    if run is None:
        sh = NamedSharding(mesh, P(None, axis))

        @jax.jit
        def run(x):
            x = jax.lax.with_sharding_constraint(x, sh)
            out = predict_fn(x)
            return jax.lax.with_sharding_constraint(out, sh)

        _SHARDED_CACHE[key] = run
    return run(x)
