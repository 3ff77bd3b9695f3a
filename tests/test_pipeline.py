"""On-device pipeline tests: shapes, determinism, degradation parity."""

import jax
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline, prefetch, stack_corpus
from sr.kernels.bicubic import pil_resize_exact_u8


def _images(n=4, size=(96, 96), c=3, seed=0):
    ds = SyntheticDataset(num_images=n, size=size, channels=c, seed=seed)
    return [ds[i] for i in range(n)]


def test_stack_corpus_orientation_and_size():
    imgs = [
        np.zeros((100, 80, 3), np.uint8),   # portrait → rotated
        np.zeros((80, 100, 3), np.uint8),
        np.zeros((90, 120, 3), np.uint8),
    ]
    bank = stack_corpus(imgs, 3)
    assert bank.shape == (3, 80, 100, 3)


def test_batch_shapes_and_range():
    pipe = PatchPipeline(_images(), crop_size=32, scale_factor=4, batch_size=8,
                         channels=3, pre_upsample=True)
    b = pipe(jax.random.key(0))
    assert b["hr"].shape == (8, 32, 32, 3)
    assert b["lr"].shape == (8, 8, 8, 3)
    assert b["bc"].shape == (8, 32, 32, 3)
    for v in b.values():
        arr = np.asarray(v)
        assert arr.min() >= 0.0 and arr.max() <= 1.0


def test_deterministic_per_key():
    pipe = PatchPipeline(_images(), crop_size=32, scale_factor=2, batch_size=4,
                         channels=3)
    a = pipe(jax.random.key(7))
    b = pipe(jax.random.key(7))
    np.testing.assert_array_equal(np.asarray(a["hr"]), np.asarray(b["hr"]))
    c = pipe(jax.random.key(8))
    assert np.abs(np.asarray(a["hr"]) - np.asarray(c["hr"])).max() > 0


def test_augment_covers_all_d4_elements():
    """Sampling the pipeline visits all 8 D4 orientations of a marked
    patch (single-image corpus of an asymmetric ramp, no random scale —
    every sample is some D4 element of the same crop)."""
    img = (np.arange(48 * 48).reshape(48, 48) % 251).astype(np.uint8)
    img = np.stack([img] * 3, -1)
    pipe = PatchPipeline([img], crop_size=48, scale_factor=4, batch_size=32,
                         channels=3, random_scale=False)
    b = np.asarray(pipe(jax.random.key(3))["hr"])
    base = img.astype(np.float32) / 255.0
    variants = []
    for k in range(4):
        for flip in (False, True):
            v = np.rot90(base, k=k)
            variants.append(np.ascontiguousarray(v[:, ::-1] if flip else v))
    seen = set()
    for i in range(b.shape[0]):
        hr = b[i].astype(np.float32)
        for g, v in enumerate(variants):
            if np.abs(hr - v).max() < 1e-3:
                seen.add(g)
                break
        else:
            raise AssertionError(f"sample {i} is not a D4 element of the corpus")
    assert len(seen) == 8, f"only saw D4 elements {sorted(seen)}"


def test_degradation_close_to_pil():
    """Device LR ≈ Pillow-exact LR of the same HR patch (<1.5/255)."""
    pipe = PatchPipeline(_images(), crop_size=32, scale_factor=4, batch_size=4,
                         channels=3, augment=False, random_scale=False)
    b = pipe(jax.random.key(0))
    hr = np.asarray(b["hr"])
    lr = np.asarray(b["lr"])
    for i in range(hr.shape[0]):
        hr_u8 = np.round(hr[i] * 255.0).astype(np.uint8)
        lr_pil = pil_resize_exact_u8(hr_u8, (8, 8)).astype(np.float64) / 255.0
        assert np.abs(lr[i] - lr_pil).max() < 1.5 / 255.0


def test_no_random_scale_patches_match_bank():
    """With augment off, HR patches are raw crops of the corpus."""
    imgs = _images(2, size=(64, 64))
    pipe = PatchPipeline(imgs, crop_size=16, scale_factor=4, batch_size=16,
                         channels=3, augment=False, random_scale=False)
    b = pipe(jax.random.key(3))
    hr = np.round(np.asarray(b["hr"]) * 255.0).astype(np.uint8)
    bank = stack_corpus(imgs, 3)
    # every patch must appear somewhere in some bank image
    for p in hr[:4]:
        found = any(
            np.array_equal(img[t : t + 16, l : l + 16], p)
            for img in bank
            for t in range(64 - 16 + 1)
            for l in range(64 - 16 + 1)
        )
        assert found


def test_prefetch_preserves_order():
    assert list(prefetch(iter(range(10)), size=3)) == list(range(10))


def test_crop_too_large_raises():
    with pytest.raises(ValueError):
        PatchPipeline(_images(size=(48, 48)), crop_size=48, scale_factor=4,
                      batch_size=2, channels=3, random_scale=True)


def test_crop_larger_than_corpus_raises_without_random_scale():
    """No silent bicubic-upscaling of corpus patches into fake HR
    (review finding): oversized crops must raise, as the random_scale
    path already did."""
    import numpy as np
    import pytest

    from sr.data.pipeline import PatchPipeline

    imgs = [np.zeros((100, 100, 3), np.uint8)] * 2
    with pytest.raises(ValueError, match="exceeds the corpus"):
        PatchPipeline(imgs, crop_size=128, scale_factor=4, batch_size=2,
                      channels=3, random_scale=False)


def test_multiscale_crop_reduction_keeps_base_scale_divisibility():
    """lcm reduction must include the config's base scale_factor:
    --multi_scale 2 3 with scale_factor 4 needs crop % 12 == 0, not
    crop % 6 == 0 (review finding: lcm(2,3)=6 yielded crop 126 which
    crashed the sampler's %4 check)."""
    import numpy as np

    from sr.data.pipeline import build_patch_pipeline
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="VDSR", num_channels=1, scale_factor=4,
                   crop_size=128, batch_size=2, scale_factors=(2, 3))
    spec = get_spec("VDSR")
    imgs = [np.zeros((300, 300, 1), np.uint8)] * 2
    pipe = build_patch_pipeline(cfg, spec, imgs)  # must not raise
    assert pipe.crop_size % 4 == 0
    for s in (2, 3):
        assert pipe.crop_size % s == 0


def test_synthetic_cannot_be_concatenated():
    import pytest

    from sr.data.datasets import get_training_set

    with pytest.raises(ValueError, match="standalone"):
        get_training_set("/tmp", ["synthetic", "other"])


def test_matrix_mode_equals_item_mode():
    """'matrix' random-scale mode must reproduce 'item' mode exactly:
    same key splits, same uniform position range (traced randint bound),
    and the zero-padded resize-matrix pair is numerically the item-mode
    per-branch resize (padded rows/cols carry zero weight; +0.0 terms
    are exact in f32)."""
    imgs = _images(n=4, size=(96, 96), c=3)
    kw = dict(crop_size=32, scale_factor=4, batch_size=16, channels=3,
              pre_upsample=True)
    item = PatchPipeline(imgs, random_scale_mode="item", **kw)
    matrix = PatchPipeline(imgs, random_scale_mode="matrix", **kw)
    a = item(jax.random.key(3))
    b = matrix(jax.random.key(3))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), rtol=0, atol=1e-5,
            err_msg=k)


def test_matrix_mode_bank_padding_and_positions():
    """The padded bank must not leak into samples: with the scale fixed
    (single-image corpus of a linear ramp), every matrix-mode patch's
    values must exist in the ORIGINAL image range."""
    ramp = (np.arange(96 * 96, dtype=np.float64).reshape(96, 96) % 251
            ).astype(np.uint8)[..., None]
    pipe = PatchPipeline([np.repeat(ramp, 3, axis=2)], crop_size=32,
                         scale_factor=4, batch_size=8, channels=3,
                         augment=False, random_scale_mode="matrix")
    # padded bank holds the edge-padded copies
    assert pipe.bank.shape[1] > 96 and pipe.bank.shape[2] > 96
    b = pipe(jax.random.key(0))
    arr = np.asarray(b["hr"])
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert b["hr"].shape == (8, 32, 32, 3)


def test_matrix_mode_in_scan_fused_step():
    """sample_fn must stay scan/jit-safe in matrix mode (traced randint
    bounds inside a multi-step program)."""
    import jax.numpy as jnp

    pipe = PatchPipeline(_images(), crop_size=32, scale_factor=4,
                         batch_size=4, channels=3,
                         random_scale_mode="matrix")

    def body(key, _):
        key, sub = jax.random.split(key)
        batch = pipe.sample_fn(pipe.bank, sub)
        return key, jnp.mean(batch["hr"])

    _, means = jax.lax.scan(body, jax.random.key(0), None, length=3)
    m = np.asarray(means)
    assert np.all(np.isfinite(m)) and np.all(m > 0)
