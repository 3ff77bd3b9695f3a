"""Eval harness tests: reference conventions end-to-end (SURVEY §4.5)."""

import json
import os

import numpy as np

from sr.data.datasets import SyntheticDataset
from sr.eval.panels import plot_loss, plot_test_result, save_img
from sr.eval.runner import evaluate
from sr.kernels.bicubic import pil_resize_exact_u8
from sr.utils.logging import JSONLLogger


def test_identity_predictor_equals_bicubic_baseline():
    """A model that returns its (pre-upsampled) input must score exactly
    the bicubic baseline PSNR."""
    ds = SyntheticDataset(num_images=3, size=(64, 64), channels=1)
    res = evaluate(
        lambda x: x, ds, scale_factor=4, channels=1, pre_upsample=True,
        dataset_name="synthetic",
    )
    assert len(res.images) == 3
    for r in res.images:
        assert r.psnr_sr == r.psnr_bicubic
    assert res.summary()["psnr_sr"] == res.summary()["psnr_bicubic"]


def test_modulo_crop_applied():
    """Odd-sized images are cropped to a multiple of the scale factor."""
    ds = SyntheticDataset(num_images=1, size=(67, 61), channels=1)
    res = evaluate(lambda x: x, ds, scale_factor=4, channels=1,
                   pre_upsample=True, keep_images=True)
    hr = res.images[0].hr
    assert hr.shape[0] % 4 == 0 and hr.shape[1] % 4 == 0


def test_eval_uses_exact_pil_degradation():
    """The LR fed to the model is the Pillow-exact degradation."""
    ds = SyntheticDataset(num_images=1, size=(32, 32), channels=1)
    captured = {}

    def probe(x):
        captured["in"] = np.asarray(x)
        return x.repeat(4, axis=1).repeat(4, axis=2)

    evaluate(probe, ds, scale_factor=4, channels=1, pre_upsample=False)
    lr_exact = pil_resize_exact_u8(ds[0], (8, 8)).astype(np.float32) / 255.0
    np.testing.assert_allclose(captured["in"][0], lr_exact, atol=1e-7)


def test_keep_images_merges_chroma():
    ds = SyntheticDataset(num_images=1, size=(32, 32), channels=3)
    res = evaluate(lambda x: x, ds, scale_factor=2, channels=1,
                   pre_upsample=True, keep_images=True)
    r = res.images[0]
    assert r.sr.shape[-1] == 3  # Y from model + bicubic chroma
    np.testing.assert_array_equal(r.sr[..., 1:], r.bicubic[..., 1:])


def test_on_device_metrics_match_host():
    """Device-side Y-PSNR ≡ host path within f32 reduction error."""
    ds = SyntheticDataset(num_images=3, size=(64, 64), channels=3)

    def blurry(x):  # an imperfect predictor so PSNR is finite
        return np.clip(x + 0.01, 0.0, 1.0)

    host = evaluate(blurry, ds, scale_factor=4, channels=1, pre_upsample=True)
    dev = evaluate(blurry, ds, scale_factor=4, channels=1, pre_upsample=True,
                   on_device_metrics=True)
    for a, b in zip(host.images, dev.images):
        assert abs(a.psnr_sr - b.psnr_sr) < 1e-3, (a.psnr_sr, b.psnr_sr)
        assert a.psnr_bicubic == b.psnr_bicubic
        # fast eval now reports SSIM too (VERDICT r2 #4)
        assert b.ssim_sr is not None
        assert abs(a.ssim_sr - b.ssim_sr) < 1e-4, (a.ssim_sr, b.ssim_sr)
        assert b.ssim_bicubic == a.ssim_bicubic
    assert "ssim_sr" in dev.summary()

    # rgb color space path
    host = evaluate(blurry, ds, scale_factor=4, channels=3, pre_upsample=True,
                    color_space="rgb")
    dev = evaluate(blurry, ds, scale_factor=4, channels=3, pre_upsample=True,
                   color_space="rgb", on_device_metrics=True)
    for a, b in zip(host.images, dev.images):
        assert abs(a.psnr_sr - b.psnr_sr) < 1e-2, (a.psnr_sr, b.psnr_sr)


class _MixedSizeDataset:
    """Every image a different size — the real Set5/Set14 shape profile."""

    def __init__(self, sizes, channels=1, seed=0):
        rng = np.random.default_rng(seed)
        self.imgs = [
            rng.integers(0, 256, (h, w, channels), dtype=np.uint8)
            for h, w in sizes
        ]
        self.names = [f"img{i}" for i in range(len(self.imgs))]

    def __len__(self):
        return len(self.imgs)

    def __getitem__(self, i):
        return self.imgs[i]


def test_static_shapes_bucketed_eval():
    """Mixed-size dataset: static_shapes costs O(1) traces and scores the
    same PSNR as the per-size path (SURVEY §7 hard part 6)."""
    import jax

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    variables = model.init(
        jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32), train=False
    )

    def make_counting_fn():
        traces = []

        @jax.jit
        def fn(x):
            traces.append(x.shape)
            return model.apply(variables, x, train=False)

        return fn, traces

    ds = _MixedSizeDataset([(128, 128), (144, 120), (120, 160)])

    fn_plain, traces_plain = make_counting_fn()
    base = evaluate(fn_plain, ds, 2, channels=1, pre_upsample=False)
    assert len(set(traces_plain)) == 3  # one compile per distinct size

    fn_static, traces_static = make_counting_fn()
    res = evaluate(fn_static, ds, 2, channels=1, pre_upsample=False,
                   static_shapes=True, tile=48, model_name="ESPCN")
    assert len(set(traces_static)) <= 2, traces_static
    for a, b in zip(base.images, res.images):
        assert abs(a.psnr_sr - b.psnr_sr) < 1e-2, (a.psnr_sr, b.psnr_sr)
        assert a.psnr_bicubic == b.psnr_bicubic


def test_static_shapes_pads_small_images():
    """Images BELOW the tiling window are zero-padded up to it and scored
    over the valid (uncontaminated) region — the whole mixed-size dataset
    costs O(1) compiles, and each padded image's PSNR is bit-for-bit the
    native-size forward's PSNR over the same region (VERDICT r2 #2)."""
    import jax

    from sr.data.native import resize_bicubic_u8
    from sr.eval.metrics import modulo_crop, psnr
    from sr.eval.runner import _pad_plan
    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="ESPCN", scale_factor=2, num_channels=1,
                   dtype="float32")
    model = get_spec("ESPCN").make_model(cfg)
    variables = model.init(
        jax.random.key(0), np.zeros((1, 8, 8, 1), np.float32), train=False
    )

    def make_counting_fn():
        traces = []

        @jax.jit
        def fn(x):
            traces.append(x.shape)
            return model.apply(variables, x, train=False)

        return fn, traces

    # LR sizes 20..150: below, at, and above the 58px window (tile 48 +
    # 2·halo 5) — the real Set5/Set14 ×4 profile where raw-LR models see
    # mostly sub-window inputs
    sizes = [(40, 40), (64, 88), (120, 120), (300, 200), (46, 136)]
    ds = _MixedSizeDataset(sizes)
    halo, tile = 5, 48
    win = tile + 2 * halo

    fn_static, traces = make_counting_fn()
    res = evaluate(fn_static, ds, 2, channels=1, pre_upsample=False,
                   static_shapes=True, tile=tile, model_name="ESPCN")
    assert len(set(traces)) <= 3, sorted(set(traces))

    fn_plain, _ = make_counting_fn()
    padded = 0
    for img, r_img in zip(ds.imgs, res.images):
        hr = modulo_crop(img, 2)
        h, w = hr.shape[:2]
        lr = resize_bicubic_u8(hr, (h // 2, w // 2))
        sr = np.asarray(fn_plain(lr.astype(np.float32)[None] / 255.0))[0]
        sr_u8 = np.clip(np.round(sr * 255.0), 0, 255).astype(np.uint8)
        ih, iw = lr.shape[:2]
        pad_h, pad_w, fb = _pad_plan(ih, iw, win, halo)
        assert not fb
        vh = (ih - halo) * 2 if pad_h else None
        vw = (iw - halo) * 2 if pad_w else None
        padded += pad_h or pad_w
        expect = psnr(
            sr_u8[:vh, :vw, 0].astype(np.float64),
            hr[:vh, :vw, 0].astype(np.float64), border=2,
        )
        assert r_img.psnr_sr == expect, (r_img.name, r_img.psnr_sr, expect)
    assert padded >= 3  # the small images actually took the padded path

    # on-device metric path agrees on the same valid regions
    fn2, _ = make_counting_fn()
    res_dev = evaluate(fn2, ds, 2, channels=1, pre_upsample=False,
                       static_shapes=True, tile=tile, model_name="ESPCN",
                       on_device_metrics=True)
    for a, b in zip(res.images, res_dev.images):
        assert abs(a.psnr_sr - b.psnr_sr) < 1e-3, (a.psnr_sr, b.psnr_sr)


def test_panels_and_logging(tmp_path):
    ds = SyntheticDataset(num_images=1, size=(32, 32), channels=3)
    hr = ds[0]
    plot_loss([1.0, 0.5, 0.3], str(tmp_path / "loss.png"))
    plot_test_result(hr, hr, hr, str(tmp_path / "panel.png"),
                     psnr_bicubic=28.0, psnr_sr=30.0, color_space="rgb")
    save_img(hr, str(tmp_path / "img.png"), color_space="rgb")
    for f in ["loss.png", "panel.png", "img.png"]:
        assert os.path.getsize(tmp_path / f) > 0

    log = JSONLLogger(str(tmp_path / "m.jsonl"))
    log({"loss": np.float32(0.5), "step": 1})
    log({"loss": 0.25, "step": 2})
    log.close()
    lines = [json.loads(l) for l in open(tmp_path / "m.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[1]["step"] == 2
