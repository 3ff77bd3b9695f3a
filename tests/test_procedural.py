"""Procedural benchmark corpus (VERDICT r3 next #1): determinism,
split disjointness, color handling, cache round-trip, and the
structural properties that make it a non-saturating SR benchmark."""

import numpy as np
import pytest

from sr.data.procedural import ProceduralDataset, generate_procedural_image


def test_deterministic_and_index_stable():
    a = ProceduralDataset(num_images=3, size=(96, 96), seed=4, split="test")
    b = ProceduralDataset(num_images=8, size=(96, 96), seed=4, split="test")
    for i in range(3):
        np.testing.assert_array_equal(a[i], b[i])  # independent of n
    assert a[0].shape == (96, 96, 3) and a[0].dtype == np.uint8


def test_splits_and_seeds_disjoint():
    tr = ProceduralDataset(num_images=2, size=(96, 96), seed=0,
                           split="train")
    te = ProceduralDataset(num_images=2, size=(96, 96), seed=0,
                           split="test")
    s1 = ProceduralDataset(num_images=2, size=(96, 96), seed=1,
                           split="train")
    assert (tr[0] != te[0]).any()
    assert (tr[0] != s1[0]).any()
    assert (tr[0] != tr[1]).any()
    with pytest.raises(ValueError, match="split"):
        ProceduralDataset(split="val")


def test_ycbcr_matches_pil_conversion():
    from PIL import Image

    rgb = ProceduralDataset(num_images=1, size=(64, 64), seed=2,
                            split="test")[0]
    ycc = ProceduralDataset(num_images=1, size=(64, 64), seed=2,
                            split="test", color_space="ycbcr")[0]
    ref = np.asarray(Image.fromarray(rgb).convert("YCbCr"), np.uint8)
    np.testing.assert_array_equal(ycc, ref)


def test_materialize_cache_roundtrip(tmp_path):
    d = str(tmp_path / "cache")
    a = ProceduralDataset(num_images=2, size=(64, 64), seed=3,
                          split="test").materialize(d)
    import os

    files = os.listdir(d)
    assert len(files) == 1 and files[0].endswith(".npz")
    b = ProceduralDataset(num_images=2, size=(64, 64), seed=3,
                          split="test").materialize(d)
    for i in range(2):
        np.testing.assert_array_equal(a[i], b[i])
    # unwritable cache dir degrades gracefully
    c = ProceduralDataset(num_images=1, size=(64, 64), seed=3,
                          split="test").materialize("/proc/nope")
    assert c[0].shape == (64, 64, 3)


def test_structured_high_frequency_content():
    """The property the old synthetic set lost: substantial
    high-frequency energy (bicubic x4 must lose real information) that
    is STRUCTURED (no white-noise floor -> reconstruction is
    model-limited). Proxy checks: strong gradients, meaningful bicubic
    x4 degradation, and zero pixelwise noise (images are piecewise
    smooth/textured, so tiny local medians match the image closely)."""
    from sr.data.native import resize_bicubic_u8

    img = ProceduralDataset(num_images=1, size=(128, 128), seed=5,
                            split="test")[0]
    g = np.abs(np.diff(img.astype(np.float64), axis=0)).mean()
    assert g > 4.0, g  # far above the ~1.5 of a blurred field
    lr = resize_bicubic_u8(img, (32, 32))
    bc = resize_bicubic_u8(lr, (128, 128))
    err = np.sqrt(np.mean((bc.astype(np.float64)
                           - img.astype(np.float64)) ** 2))
    # bicubic x4 RMSE well above a saturated benchmark's (~5 u8 steps
    # = ~34 dB) but far from noise (u8 RMSE of white noise ~73)
    assert 6.0 < err < 60.0, err


def test_dataset_registry_wiring(tmp_path, monkeypatch):
    """'procedural' resolves via get_training_set/get_test_set with the
    documented sizes (materialization is stubbed out — generating the
    real 512-image corpus belongs to training runs, not unit tests)."""
    from sr.data.datasets import get_test_set, get_training_set

    monkeypatch.setattr(ProceduralDataset, "materialize",
                        lambda self, d: self)
    tr = get_training_set(str(tmp_path), "procedural", "rgb")
    te = get_test_set(str(tmp_path), "procedural", "rgb")
    assert len(tr) == 512 and len(te) == 128
    assert tr.split == "train" and te.split == "test"
    assert te.names[0] == "procedural_test_000"
    with pytest.raises(ValueError, match="standalone"):
        get_training_set(str(tmp_path), ["procedural", "bsds300"], "rgb")


def test_generate_image_full_pipeline_compat():
    """A procedural corpus flows through PatchPipeline unchanged."""
    import jax

    from sr.data.pipeline import PatchPipeline

    ds = ProceduralDataset(num_images=3, size=(128, 128), seed=6,
                           split="train")
    pipe = PatchPipeline([ds[i] for i in range(3)], crop_size=32,
                         scale_factor=4, batch_size=4, channels=3,
                         augment=True, random_scale=True)
    batch = pipe(jax.random.key(0))
    assert batch["hr"].shape == (4, 32, 32, 3)
    assert batch["lr"].shape == (4, 8, 8, 3)
    assert float(batch["hr"].max()) <= 1.0


def test_rng_isolated_from_global_state():
    rng = np.random.default_rng(0)
    img1 = generate_procedural_image(rng, 64, 64)
    np.random.seed(123)  # global state must not matter
    rng = np.random.default_rng(0)
    img2 = generate_procedural_image(rng, 64, 64)
    np.testing.assert_array_equal(img1, img2)
