"""On-device training pipeline: HBM image bank + jitted patch sampler.

The reference runs its whole per-item transform chain (random scale →
random crop → rotate/flip → PIL bicubic downscale) in CPU DataLoader
workers and copies each batch to the device
(reference: dataset.py:DatasetFromFolder.__getitem__). TPU-first inversion:

  * The entire training corpus is decoded ONCE on host, orientation-
    normalized, stacked, and placed in HBM as a uint8 array.
  * Each training batch is produced by ONE jitted function of a PRNG key:
    image pick, random-scale (discrete set, lax.switch over static resize
    matrices), random square crop (dynamic_slice), rot90/flip augmentation,
    bicubic LR degradation (two MXU matmuls, Pillow-parity weights), and
    [0,1] normalization — all device-side, with static shapes.
  * The sampler is dispatched ahead of consumption (async dispatch acts as
    a natural double-buffer; see :func:`prefetch`).

Behavioral deltas vs the reference (documented on purpose):
  * random scale is drawn from {1.0, 0.9, 0.8, 0.7, 0.6, 0.5} instead of
    continuous U[0.5, 1] — XLA needs static shapes per branch.
  * device-side degradation uses float32 Pillow-parity weights (max error
    <1/255 vs Pillow's fixed-point path, golden-tested); eval uses the
    bit-exact host path (sr/kernels/bicubic.py:pil_resize_exact_u8).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from sr.kernels.bicubic import resize2d, resize_matrix

RANDOM_SCALES = (1.0, 0.9, 0.8, 0.7, 0.6, 0.5)


def stack_corpus(images: list[np.ndarray], channels: int) -> np.ndarray:
    """Orientation-normalize + center-crop a corpus to a common (N,H,W,C).

    Portrait images are rotated 90° (harmless: rotation is already part of
    the augmentation menu), then all images are center-cropped to the
    minimum common size.
    """
    normed = []
    for im in images:
        if im.ndim == 2:
            im = im[:, :, None]
        if im.shape[0] > im.shape[1]:
            im = np.rot90(im, axes=(0, 1)).copy()
        if channels == 1 and im.shape[2] >= 1:
            im = im[:, :, :1]
        elif channels == 3 and im.shape[2] == 1:
            im = np.repeat(im, 3, axis=2)
        else:
            im = im[:, :, :channels]
        normed.append(im)
    hmin = min(im.shape[0] for im in normed)
    wmin = min(im.shape[1] for im in normed)
    out = np.stack(
        [
            im[
                (im.shape[0] - hmin) // 2 : (im.shape[0] - hmin) // 2 + hmin,
                (im.shape[1] - wmin) // 2 : (im.shape[1] - wmin) // 2 + wmin,
            ]
            for im in normed
        ]
    )
    return np.ascontiguousarray(out)


@dataclass
class PatchPipeline:
    """Jitted (lr, hr) patch-batch sampler over an HBM-resident corpus.

    Args mirror the reference's dataset knobs: ``crop_size`` (HR patch),
    ``scale_factor``, ``batch_size``, ``channels`` (1 = Y, 3 = RGB),
    ``augment`` (rot/flip), ``random_scale``. ``pre_upsample`` additionally
    returns the bicubic-upscaled LR (the input convention of
    SRCNN/VDSR/DRCN — reference: utils.py:img_interp).
    """

    images: list[np.ndarray] | np.ndarray
    crop_size: int = 128
    scale_factor: int = 4
    batch_size: int = 32
    channels: int = 3
    augment: bool = True
    random_scale: bool = True
    # 'item' draws the random-scale per sample (reference behavior) via
    # lax.switch — but under vmap the predicate is batched, so XLA
    # computes ALL six resize branches per sample and selects. 'batch'
    # draws once per batch (the predicate is unbatched → one true
    # branch; MEASURED 1.37× on ESPCN — PERF.md) at the cost of a
    # behavioral delta. 'matrix' keeps the per-item draw but moves the
    # branching from DATA to WEIGHTS: the bank is edge-padded by
    # (max_patch − crop), every sample slices one max_patch square, and
    # the scale draw selects a zero-padded (crop, max_patch)
    # Pillow-parity resize matrix — the six branches collapse into one
    # batched matmul pair (MXU) with the same per-sample position/scale
    # distribution as 'item' (positions are drawn over the ORIGINAL
    # image extent with a dynamic upper bound; padded rows/cols carry
    # zero weight, so the result is numerically the item-mode resize).
    random_scale_mode: str = "matrix"
    pre_upsample: bool = False
    # multi-scale training (VDSR/DRCN are multi-scale-capable —
    # reference: vdsr.py trains one net for ×2/×3/×4): each sample draws
    # its scale from this tuple; requires pre_upsample (the model input
    # 'bc' keeps a static shape across scales). Empty = single scale.
    scale_factors: tuple = ()
    dtype: jnp.dtype = jnp.float32
    _bank: jax.Array = field(init=False, repr=False)
    _sample: callable = field(init=False, repr=False)

    def __post_init__(self):
        if isinstance(self.images, np.ndarray):
            bank = self.images
        else:
            bank = stack_corpus(list(self.images), self.channels)
        n, h, w, c = bank.shape
        assert c == self.channels, (bank.shape, self.channels)
        max_patch = int(np.ceil(self.crop_size / min(RANDOM_SCALES)))
        if self.random_scale and max_patch > min(h, w):
            raise ValueError(
                f"crop_size {self.crop_size} with random_scale needs images "
                f"≥{max_patch}px, corpus is {h}x{w}"
            )
        if not self.random_scale and self.crop_size > min(h, w):
            # without this, crop_branch would silently bicubic-UPSCALE
            # corpus patches into fake HR targets
            raise ValueError(
                f"crop_size {self.crop_size} exceeds the corpus "
                f"({h}x{w}); reduce crop_size (build_patch_pipeline "
                "does this automatically)"
            )
        if self.crop_size % self.scale_factor:
            raise ValueError("crop_size must divide by scale_factor")
        if self.random_scale_mode not in ("item", "batch", "matrix"):
            raise ValueError(
                f"random_scale_mode must be 'item', 'batch' or 'matrix', "
                f"got {self.random_scale_mode!r}"
            )
        if self.scale_factors:
            if not self.pre_upsample:
                raise ValueError(
                    "multi-scale batches need pre_upsample=True (only the "
                    "bicubic-upscaled input has a static shape across scales)"
                )
            for r in self.scale_factors:
                if self.crop_size % r:
                    raise ValueError(f"crop_size must divide by scale {r}")
        if self.random_scale_mode == "matrix" and self.random_scale:
            # edge-pad so a max_patch slice starting anywhere in the
            # ORIGINAL position range [0, dim - patch_size] stays in
            # bounds; padded rows/cols are never read (zero weight in
            # the selected resize matrix), the padding only prevents
            # dynamic_slice's start-clamping from skewing the position
            # distribution near the bottom/right borders
            sizes = [min(int(round(self.crop_size / s)), min(h, w))
                     for s in RANDOM_SCALES]
            pad = max(sizes) - min(sizes)
            if pad:
                bank = np.pad(bank, ((0, 0), (0, pad), (0, pad), (0, 0)),
                              mode="edge")
        self._bank = jax.device_put(bank)
        self._sample = jax.jit(self._make_sampler(n, h, w))

    # -- sampler construction (all static shapes) ------------------------

    def _make_sampler(self, n: int, h: int, w: int):
        crop = self.crop_size
        lr_size = crop // self.scale_factor
        scales = RANDOM_SCALES if self.random_scale else (1.0,)
        # static source-patch size per scale branch
        patch_sizes = [min(int(round(crop / s)), min(h, w)) for s in scales]
        matrix_mode = self.random_scale_mode == "matrix" and len(scales) > 1
        if matrix_mode:
            # one (crop, max_patch) Pillow-parity resize matrix per
            # scale, zero-padded past each scale's true patch size; the
            # per-sample scale draw selects a MATRIX (tiny) instead of a
            # lax.switch branch on DATA, so vmap lowers the whole batch
            # to one matmul pair instead of all six resizes + select
            max_p = max(patch_sizes)
            w_np = np.zeros((len(scales), crop, max_p), np.float32)
            for i, p in enumerate(patch_sizes):
                w_np[i, :, :p] = resize_matrix(p, crop)
            w_stack = jnp.asarray(w_np)
            p_arr = jnp.asarray(patch_sizes, jnp.int32)

        def one(bank, key, s_idx):
            ks = jax.random.split(key, 6)
            idx = jax.random.randint(ks[0], (), 0, n)
            img = bank[idx]  # (h, w, c) uint8

            def crop_branch(p):
                def fn(key):
                    ky, kx = jax.random.split(key)
                    top = jax.random.randint(ky, (), 0, h - p + 1)
                    left = jax.random.randint(kx, (), 0, w - p + 1)
                    patch = jax.lax.dynamic_slice(
                        img, (top, left, 0), (p, p, self.channels)
                    ).astype(jnp.float32)
                    if p != crop:
                        patch = resize2d(patch, (crop, crop))
                    return patch

                return fn

            if matrix_mode:
                # same key splits and the same uniform position range
                # [0, dim - p] as the item-mode branches (the randint
                # bound is traced; the slice itself is max_p-static)
                ky, kx = jax.random.split(ks[2])
                p = p_arr[s_idx]
                top = jax.random.randint(ky, (), 0, h - p + 1)
                left = jax.random.randint(kx, (), 0, w - p + 1)
                patch = jax.lax.dynamic_slice(
                    img, (top, left, 0), (max_p, max_p, self.channels)
                ).astype(jnp.float32)
                m = w_stack[s_idx]
                # width pass → clip → height pass, matching resize2d's
                # pass order and Pillow's intermediate [0,255] clamp
                t = jnp.clip(
                    jnp.einsum("ow,hwc->hoc", m, patch,
                               preferred_element_type=jnp.float32),
                    0.0, 255.0)
                hr = jnp.clip(
                    jnp.einsum("oh,hwc->owc", m, t,
                               preferred_element_type=jnp.float32),
                    0.0, 255.0)
            elif len(scales) > 1:
                hr = jax.lax.switch(
                    s_idx, [crop_branch(p) for p in patch_sizes], ks[2]
                )
            else:
                hr = crop_branch(patch_sizes[0])(ks[2])

            if self.augment:
                # vmap materializes all four rot90 branches (+ both flip
                # arms) per sample and selects — but those are VECTORIZED
                # layout ops, and the measured alternative (one D4 gather
                # hr[iy, ix] from per-sample index maps, bit-exact) lost
                # 0.69× on EDSR / worse on ESPCN on-chip: TPU dynamic
                # gathers are slower than branch-materialized reverses/
                # transposes at this size. Rejected with data — PERF.md
                # "one-gather D4 augment A/B (rejected)".
                k_rot = jax.random.randint(ks[3], (), 0, 4)
                hr = jax.lax.switch(
                    k_rot, [lambda x, i=i: jnp.rot90(x, k=i) for i in range(4)], hr
                )
                hr = jax.lax.cond(
                    jax.random.bernoulli(ks[4]), lambda x: x[:, ::-1], lambda x: x, hr
                )
            if self.scale_factors:
                # per-sample scale draw; only bc (static shape) is exposed
                def degrade(r):
                    def fn(h):
                        lr_r = resize2d(h, (crop // r, crop // r))
                        return resize2d(lr_r, (crop, crop))

                    return fn

                r_idx = jax.random.randint(ks[5], (), 0, len(self.scale_factors))
                bc = jax.lax.switch(
                    r_idx, [degrade(r) for r in self.scale_factors], hr
                )
                return {"hr": hr, "bc": bc}
            lr = resize2d(hr, (lr_size, lr_size))
            out = {"hr": hr, "lr": lr}
            if self.pre_upsample:
                out["bc"] = resize2d(lr, (crop, crop))
            return out

        def sample(bank, key):
            key, ks_key = jax.random.split(key)
            keys = jax.random.split(key, self.batch_size)
            if self.random_scale_mode == "batch":
                # one scale per batch → the switch predicate is unbatched
                # and vmap keeps it a true branch (one resize, not six)
                s_idx = jax.random.randint(ks_key, (), 0, len(scales))
                batch = jax.vmap(lambda k: one(bank, k, s_idx))(keys)
            else:  # per-item (reference behavior)
                s_all = jax.random.randint(
                    ks_key, (self.batch_size,), 0, len(scales)
                )
                batch = jax.vmap(lambda k, s: one(bank, k, s))(keys, s_all)
            # normalize to [0,1] in the compute dtype
            return jax.tree.map(lambda x: (x / 255.0).astype(self.dtype), batch)

        return sample

    def __call__(self, key: jax.Array) -> dict[str, jax.Array]:
        """One (lr, hr[, bc]) batch dict, NHWC in [0,1]."""
        return self._sample(self._bank, key)

    @property
    def bank(self) -> jax.Array:
        """The HBM-resident corpus (N, H, W, C) uint8."""
        return self._bank

    @property
    def sample_fn(self):
        """The pure sampler ``fn(bank, key) -> batch`` — jit/scan-safe, so
        trainers can fold sampling INTO the train-step program (zero host
        work per step; see Trainer.fit(steps_per_dispatch>1))."""
        return self._sample

    def batches(self, key: jax.Array, num: int | None = None) -> Iterator[dict]:
        """Infinite (or ``num``-long) stream of batches."""
        i = 0
        while num is None or i < num:
            key, sub = jax.random.split(key)
            yield self._sample(self._bank, sub)
            i += 1


def build_patch_pipeline(cfg, spec, images: list[np.ndarray]) -> PatchPipeline:
    """Corpus-aware pipeline construction shared by the CLI and the
    compat wrappers: reduce crop_size to fit the corpus (warn), disable
    random-scale when the 0.5× branch wouldn't fit, and honor the
    config's multi-scale factors for pre-upsample models."""
    min_dim = min(min(im.shape[0], im.shape[1]) for im in images)
    crop = cfg.crop_size
    if crop > min_dim:
        crop = (min_dim // cfg.scale_factor) * cfg.scale_factor
        print(f"[warn] crop_size reduced to {crop} for a {min_dim}px corpus")
    random_scale = crop * 2 <= min_dim
    scale_factors = tuple(getattr(cfg, "scale_factors", ()) or ())
    if scale_factors and not spec.pre_upsample:
        print(f"[warn] {cfg.model_name} is not pre-upsample; "
              "--multi_scale ignored")
        scale_factors = ()
    if scale_factors:
        # the reduced crop must stay divisible by EVERY scale in play,
        # including the config's base scale_factor (the sampler's own
        # divisibility check) — lcm over just the multi-scale tuple can
        # yield e.g. 126 for (2,3) and crash on scale_factor=4
        lcm = int(np.lcm.reduce(np.array(scale_factors + (cfg.scale_factor,))))
        if crop % lcm:
            crop = (crop // lcm) * lcm
            print(f"[warn] crop_size reduced to {crop} (divisible by "
                  f"all of {scale_factors} and x{cfg.scale_factor})")
    return PatchPipeline(
        images, crop_size=crop, scale_factor=cfg.scale_factor,
        batch_size=cfg.batch_size, channels=cfg.num_channels,
        pre_upsample=spec.pre_upsample, random_scale=random_scale,
        scale_factors=scale_factors,
        random_scale_mode=getattr(cfg, "random_scale_mode", "matrix"),
    )


def prefetch(it: Iterator, size: int = 2) -> Iterator:
    """Keep ``size`` already-dispatched batches in flight.

    JAX dispatch is async, so simply pulling ahead of the consumer
    overlaps sampler compute + HBM residency with the training step —
    the HBM-resident batch queue from BASELINE.json.north_star.
    """
    import collections

    buf = collections.deque()
    for x in it:
        buf.append(x)
        if len(buf) > size:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
