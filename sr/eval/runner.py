"""Evaluation harness: the reference's ``model.test()`` conventions.

Per test image (reference: each wrapper's ``test`` + dataset.py test
branch, SURVEY §3.2):

  1. modulo-crop the HR image to a multiple of the scale factor;
  2. degrade to LR with BIT-EXACT Pillow bicubic
     (sr/kernels/bicubic.py:pil_resize_exact_u8);
  3. bicubic-upscale the LR back up (eval baseline + pre-upsample input);
  4. run the model; de-normalize; report Y-channel PSNR after shaving
     ``scale_factor`` border pixels — for BOTH the model output and the
     bicubic baseline.

1-channel models operate on Y of YCbCr; chroma is bicubic-upscaled and
merged back for the rendered panels (reference behavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from sr.eval.metrics import modulo_crop, psnr, rgb_to_ycbcr, ssim, ssim_device
from sr.data.native import resize_bicubic_u8  # native when built, numpy fallback


@dataclass
class ImageResult:
    name: str
    psnr_sr: float
    psnr_bicubic: float
    ssim_sr: float | None = None  # SSIM (host path f64 / device path f32)
    ssim_bicubic: float | None = None
    sr: np.ndarray | None = None  # uint8 HWC (render channels)
    bicubic: np.ndarray | None = None
    hr: np.ndarray | None = None


@dataclass
class EvalResult:
    dataset: str
    scale_factor: int
    images: list[ImageResult] = field(default_factory=list)

    @property
    def avg_psnr_sr(self) -> float:
        return float(np.mean([r.psnr_sr for r in self.images]))

    @property
    def avg_psnr_bicubic(self) -> float:
        return float(np.mean([r.psnr_bicubic for r in self.images]))

    def summary(self) -> dict:
        return {
            "dataset": self.dataset,
            "scale_factor": self.scale_factor,
            "num_images": len(self.images),
            "psnr_sr": round(self.avg_psnr_sr, 4),
            "psnr_bicubic": round(self.avg_psnr_bicubic, 4),
            **self._ssim_summary(),
        }

    def _ssim_summary(self) -> dict:
        """Mean SSIM over the images that have it (images whose shaved
        size is under the 11×11 window carry None — they are excluded
        from the mean, not allowed to suppress the metric)."""
        pairs = [(r.ssim_sr, r.ssim_bicubic) for r in self.images
                 if r.ssim_sr is not None]
        if not pairs:
            return {}
        out = {
            "ssim_sr": round(float(np.mean([p[0] for p in pairs])), 4),
            "ssim_bicubic": round(float(np.mean([p[1] for p in pairs])), 4),
        }
        if len(pairs) != len(self.images):
            out["ssim_images"] = len(pairs)
        if out["ssim_sr"] > 1.0001 or out["ssim_bicubic"] > 1.0001:
            # mathematically impossible for a correct SSIM — the round-4
            # signature of low-precision device blurs (metrics.ssim_device)
            import sys

            print(f"[eval] WARNING: SSIM > 1 ({out}) — device-metric "
                  "precision bug; values are invalid", file=sys.stderr)
        return out


def _rgb_to_y(rgb_u8: np.ndarray) -> np.ndarray:
    return np.asarray(rgb_to_ycbcr(rgb_u8.astype(np.float32)))[..., 0].astype(
        np.float64
    )


def _device_y_metrics(sr_float, hr_u8, channels, color_space, border):
    """Y-channel PSNR + SSIM computed ON DEVICE — only scalars leave the
    chip.

    Matters both for production (no host round-trip of full images) and
    for this environment (relay D2H runs at ~180 KB/s). Replicates the
    host path exactly up to f32 reduction error (≤1e-4 dB PSNR, ≤1e-5
    SSIM on real image sizes; locked by tests/test_eval.py and
    tests/test_metrics.py). SSIM is None when the shaved image is
    smaller than the 11×11 window (host-path convention).
    """
    import jax.numpy as jnp

    sr_float = jnp.asarray(sr_float)
    if sr_float.dtype == jnp.uint8:  # predict emits u8 (sr.quant.to_u8)
        sr_u8f = sr_float.astype(jnp.float32)
    else:
        sr_u8f = jnp.clip(jnp.round(sr_float * 255.0), 0, 255)
    hr = jnp.asarray(hr_u8).astype(jnp.float32)
    if channels == 1:
        y_sr, y_hr = sr_u8f[..., 0], hr[..., 0]
    elif color_space == "rgb":
        y_sr = rgb_to_ycbcr(sr_u8f)[..., 0]
        y_hr = rgb_to_ycbcr(hr)[..., 0]
    else:
        y_sr, y_hr = sr_u8f[..., 0], hr[..., 0]
    if border:
        y_sr = y_sr[..., border:-border, border:-border]
        y_hr = y_hr[..., border:-border, border:-border]
    mse = jnp.mean((y_sr - y_hr) ** 2)
    val = 20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-20)))
    # match the host path on perfect reconstruction (inf, not ~248 dB)
    p = jnp.where(mse == 0.0, jnp.inf, val)
    s = (
        ssim_device(y_sr, y_hr)
        if y_sr.shape[0] >= 11 and y_sr.shape[1] >= 11
        else None
    )
    return p, s


def _pad_plan(ih: int, iw: int, win: int, halo: int) -> tuple[bool, bool, bool]:
    """Shape-bucketing decision for one model input: (pad_h, pad_w,
    fallback). A dim below the tiling window is zero-padded up to it
    unless fewer than 8 valid model-input pixels would survive the
    halo shave (dim ≤ halo+7) — those images run native-size."""
    pad_h, pad_w = ih < win, iw < win
    fallback = (pad_h and ih - halo < 8) or (pad_w and iw - halo < 8)
    return pad_h and not fallback, pad_w and not fallback, fallback


def _prep_eval_image(img, r: int, channels: int, pre_upsample: bool):
    """The harness's per-image input contract (reference:
    dataset.py:DatasetFromFolder test mode): modulo-crop → exact bicubic
    LR → bicubic-up baseline → normalized model input. Returns
    ``(hr, bicubic, model_in_u8, x)`` with ``x`` a (1,h,w,C) f32 [0,1]
    batch shaped exactly as ``evaluate`` feeds ``predict_fn``."""
    if img.ndim == 2:
        img = img[:, :, None]
    hr = modulo_crop(img, r)
    h, w = hr.shape[:2]
    lr = resize_bicubic_u8(hr, (h // r, w // r))
    bc = resize_bicubic_u8(lr, (h, w))
    if channels == 1:
        model_in = (bc if pre_upsample else lr)[..., :1]
    else:
        model_in = bc if pre_upsample else lr
        if model_in.shape[-1] == 1:
            model_in = np.repeat(model_in, 3, axis=2)
    return hr, bc, model_in, model_in.astype(np.float32)[None] / 255.0


def eval_model_inputs(dataset, scale_factor: int, channels: int,
                      pre_upsample: bool):
    """Yield every image's model input exactly as ``evaluate`` feeds it —
    the calibration corpus for static-int8 quantization
    (``sr.quant.calibrate_scales_batches``): calibrating on the full eval
    set removes the single-image saturation that a lazy first-batch
    calibration suffers on range-diverse datasets (RESULTS.md int8
    columns)."""
    for i in range(len(dataset)):
        yield _prep_eval_image(dataset[i], scale_factor, channels,
                               pre_upsample)[3]


def evaluate(
    predict_fn,
    dataset,
    scale_factor: int,
    channels: int = 1,
    pre_upsample: bool = False,
    dataset_name: str = "",
    shave_border: int | None = None,
    keep_images: bool = False,
    color_space: str = "ycbcr",
    on_device_metrics: bool = False,
    static_shapes: bool = False,
    tile: int = 96,
    model_name: str = "",
) -> EvalResult:
    """Run the harness over a FolderDataset/SyntheticDataset.

    ``predict_fn(x)`` maps a (1,h,w,channels) float32 [0,1] batch to the
    SR output batch. ``color_space`` describes how dataset images are
    encoded ('ycbcr' per the reference loader, or 'rgb' — synthetic).
    ``on_device_metrics`` computes the SR PSNR **and SSIM** on device
    and transfers only the scalars (use when D2H bandwidth is the
    bottleneck; implies the SR image itself is only fetched when
    ``keep_images``).

    ``static_shapes`` routes every image through exact halo-tiled
    inference with ONE fixed window/batch shape, so a mixed-size dataset
    (real Set5/Set14 — every image a different size) costs O(1) jit
    compiles instead of one 40–200 s remote compile per image (SURVEY §7
    hard part 6). Numerically identical to the direct forward because the
    halo covers the model's receptive field (``model_name`` selects it
    from sr.eval.tiling.RECEPTIVE_FIELD).

    Images smaller than the window (tile + 2·halo) are zero-padded on the
    RIGHT/BOTTOM up to the window and the output cropped back — top/left
    edges stay flush, so by conv locality everything farther than ``halo``
    from a padded edge is equal to the unpadded forward. Metrics for a
    padded image are computed over that VALID region only (the ≤halo-wide
    band along a padded edge is excluded — it saw the pad, not the
    network's own boundary condition). This keeps the O(1)-compile
    guarantee unconditional: small images share ONE (1, win, win, C)
    program. Only images so tiny that fewer than 8 valid model-input
    pixels would remain (dim ≤ halo+7) fall back to a native-size
    forward — one compile per distinct such shape, reported by a warning.
    """
    r = scale_factor
    border = r if shave_border is None else shave_border
    res = EvalResult(dataset_name or getattr(dataset, "name", "test"), r)

    if static_shapes:
        from sr.eval.tiling import RECEPTIVE_FIELD, tiled_predict

        halo = RECEPTIVE_FIELD.get(model_name.lower(), 48)
        net_scale = 1 if pre_upsample else scale_factor
        inner_fn = predict_fn
        _fallback_shapes: set = set()
        _win = tile + 2 * halo

        def predict_fn(x, _inner=inner_fn, _halo=halo, _scale=net_scale):
            ih, iw = x.shape[1], x.shape[2]
            pad_h, pad_w, fallback = _pad_plan(ih, iw, _win, _halo)
            if fallback:
                _fallback_shapes.add((ih, iw))
            elif pad_h or pad_w:
                # pad right/bottom only: top/left stay flush with the
                # array edge, so the network's own 'SAME' boundary
                # condition applies there exactly as in the unpadded
                # forward; the output is cropped back below and metrics
                # exclude the halo-wide band along each padded edge
                x = np.pad(
                    np.asarray(x),
                    ((0, 0), (0, max(_win - ih, 0)), (0, max(_win - iw, 0)),
                     (0, 0)),
                )
            out = tiled_predict(
                _inner, x, _scale, tile=tile, halo=_halo,
                max_tiles_per_call=8, fixed_chunk=True,
            )
            return out[:, : ih * _scale, : iw * _scale]

    names = dataset.names
    for i in range(len(dataset)):
        hr, bc, model_in, x = _prep_eval_image(
            dataset[i], r, channels, pre_upsample)
        sr_dev = predict_fn(x)

        # metric region for shape-bucketed padded images: drop the
        # ≤halo-wide output band along each PADDED edge (it saw the zero
        # pad, not the network's own boundary condition); everything
        # else is equal to the unpadded forward by conv locality.
        # vh/vw stay None (full image) for unpadded images.
        vh = vw = None
        if static_shapes:
            ih, iw = model_in.shape[:2]
            pad_h, pad_w, _fb = _pad_plan(ih, iw, _win, halo)
            if pad_h:
                vh = (ih - halo) * net_scale
            if pad_w:
                vw = (iw - halo) * net_scale
        hr_v, bc_v = hr[:vh, :vw], bc[:vh, :vw]

        if on_device_metrics and not keep_images:
            hr_cmp = hr_v[..., :1] if channels == 1 else hr_v
            p_dev, s_dev = _device_y_metrics(
                sr_dev[0][:vh, :vw], hr_cmp, channels, color_space, border
            )
            p_sr = float(p_dev)
            s_sr = float(s_dev) if s_dev is not None else None
            y_hr = hr_v[..., 0].astype(np.float64)
            y_bc = (
                bc_v[..., 0].astype(np.float64)
                if (channels == 1 or color_space != "rgb")
                else _rgb_to_y(bc_v)
            )
            if channels == 3 and color_space == "rgb":
                y_hr = _rgb_to_y(hr_v)
            p_bc = psnr(y_bc, y_hr, border=border)
            try:
                s_bc = ssim(y_bc, y_hr, border=border)
            except ValueError:  # smaller than the 11x11 SSIM window
                s_bc = None
            res.images.append(
                ImageResult(names[i], p_sr, p_bc, ssim_sr=s_sr,
                            ssim_bicubic=s_bc)
            )
            continue

        sr = np.asarray(sr_dev)[0]
        if sr.dtype == np.uint8:  # predict emits u8 (sr.quant.to_u8)
            sr_u8 = sr
        else:
            sr_u8 = np.clip(np.round(sr * 255.0), 0, 255).astype(np.uint8)
        sr_v = sr_u8[:vh, :vw]

        # --- PSNR on Y (the reference's parity metric) ----------------
        if channels == 1:
            # dataset is YCbCr (or single-channel): channel 0 is Y
            y_hr, y_bc, y_sr = (
                hr_v[..., 0].astype(np.float64),
                bc_v[..., 0].astype(np.float64),
                sr_v[..., 0].astype(np.float64),
            )
        else:
            if color_space == "rgb":
                y_hr, y_bc, y_sr = map(_rgb_to_y, (hr_v, bc_v, sr_v))
            else:  # ycbcr-encoded dataset, 3-channel model sees YCbCr
                y_hr, y_bc, y_sr = (
                    hr_v[..., 0].astype(np.float64),
                    bc_v[..., 0].astype(np.float64),
                    sr_v[..., 0].astype(np.float64),
                )
        p_sr = psnr(y_sr, y_hr, border=border)
        p_bc = psnr(y_bc, y_hr, border=border)
        try:
            s_sr = ssim(y_sr, y_hr, border=border)
            s_bc = ssim(y_bc, y_hr, border=border)
        except ValueError:  # image smaller than the 11x11 SSIM window
            s_sr = s_bc = None

        rendered = None
        if keep_images:
            if channels == 1 and hr.shape[-1] == 3:
                # merge SR Y with bicubic chroma (reference render path)
                rendered = np.concatenate([sr_u8[..., :1], bc[..., 1:]], axis=-1)
            else:
                rendered = sr_u8
        res.images.append(
            ImageResult(
                names[i], p_sr, p_bc,
                ssim_sr=s_sr, ssim_bicubic=s_bc,
                sr=rendered,
                bicubic=bc if keep_images else None,
                hr=hr if keep_images else None,
            )
        )
    if static_shapes and _fallback_shapes:
        print(
            f"[eval] static_shapes: {len(_fallback_shapes)} distinct "
            f"input shape(s) were too small to pad-and-mask (≤{halo + 7}px "
            f"against a {halo}px receptive-field halo) and ran native-size "
            "forwards (one compile each); use a smaller model or accept "
            "the extra compiles"
        )
    return res
