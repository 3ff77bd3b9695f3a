"""One-call inference API: upscale an image with a trained model.

The user-facing serving surface: loads exported params, picks the right
input convention (pre-upsample vs raw LR, Y-channel vs RGB), routes big
images through halo-tiled inference, optionally uses the fused affine
tail (EDSR), and merges chroma for 1-channel models — everything the
reference's ``test()`` did per-model, as one reusable function.

    from sr.infer import upscale
    sr_img = upscale(img_u8, "EDSR", "results/EDSR_x4/EDSR_params.npz",
                     scale_factor=4)
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from sr.data.native import resize_bicubic_u8
from sr.models.registry import get_spec
from sr.utils.checkpoint import load_params
from sr.utils.config import SRConfig


def make_serving_predict(model, variables, fused: bool,
                         quantize: bool | str = False,
                         calib_headroom: float = 1.0,
                         output_u8: bool = False,
                         calib_batches=None):
    """ONE place for the serving-variant policy, shared by sr.infer and
    sr.export: ``fused`` picks the collapsed affine tail where the tail
    is affine (EDSR), else the exact phase-folded tail (SRResNet/SRGAN);
    models without a PS tail (or when ``fused=False``) run the exact
    graph. ``quantize`` runs every conv as int8: ``True``/``"dynamic"``
    uses per-sample activation scales on the exact-topology graph
    (footprint lever; tail rewrites assume float conv algebra);
    ``"static"`` uses scales calibrated on the first batch and, with
    ``fused``, composes with the collapsed affine tail — the fastest
    serving path (PERF.md round-3 int8-static entry). ``output_u8``
    quantizes the output to uint8 INSIDE the program (sr.quant.to_u8 —
    bit-equal to the host conversion, ¼ the device→host bytes)."""
    if quantize:
        if quantize not in (True, "dynamic", "static"):
            raise ValueError(
                f"quantize must be False/True/'dynamic'/'static', "
                f"got {quantize!r}")
        mode = "static" if quantize == "static" else "dynamic"
        if mode == "static" and fused and hasattr(model, "tail"):
            try:
                from sr.kernels.fused_tail import (
                    make_fused_tail_predict_quant)

                return make_fused_tail_predict_quant(
                    model, variables, calib_headroom=calib_headroom,
                    output_u8=output_u8, calib_batches=calib_batches)
            except (ValueError, KeyError):
                # activation-bearing tails (SRResNet/SRGAN): int8 body
                # + int8 phase-folded output conv instead
                try:
                    from sr.kernels.shuffle_fold import (
                        make_folded_tail_predict_quant)

                    return make_folded_tail_predict_quant(
                        model, variables, calib_headroom=calib_headroom,
                        output_u8=output_u8, calib_batches=calib_batches)
                except (ValueError, KeyError, AssertionError):
                    pass  # no PS tail: exact-graph static int8 below
        from sr.quant import make_quantized_predict

        return make_quantized_predict(model, variables, mode=mode,
                                      calib_headroom=calib_headroom,
                                      output_u8=output_u8,
                                      calib_batches=calib_batches)
    if output_u8:
        from sr.quant import to_u8 as _post
    else:
        def _post(y):
            return y
    if fused and hasattr(model, "tail"):
        try:
            # affine tails (EDSR) collapse to one conv (interior-exact)
            from sr.kernels.fused_tail import make_fused_tail_predict

            fn = make_fused_tail_predict(model, variables)
        except (ValueError, KeyError):
            # activation-bearing tails (SRResNet/SRGAN): fold the output
            # conv through the last shuffle instead — fully exact
            from sr.kernels.shuffle_fold import make_folded_tail_predict

            fn = make_folded_tail_predict(model, variables)
        # tracing through the inner jitted fn inlines it: ONE program
        return jax.jit(lambda x: _post(fn(x))) if output_u8 else fn
    return jax.jit(
        lambda x: _post(model.apply(variables, x, train=False)))


def make_pyramid_level_predict(model, variables, spec, trained_scale: int,
                               select_scale: int, output_u8: bool = False):
    """Serve a pyramid model's intermediate ×``select_scale`` level.

    Multi-scale pyramid (LapSRN): one net trained at ``trained_scale``
    serves every power-of-2 scale below it from its deep-supervised
    intermediate outputs (VERDICT r3 missing #6). Exact graph only —
    the fused/quant tail rewrites target single-output tails. Shared by
    sr.infer (model mode) and sr.export (artifact mode)."""
    import math

    if not spec.multi_scale_out:
        raise ValueError(
            f"{spec.name} has no intermediate scales; net_scale "
            "only applies to pyramid models (LapSRN)")
    if select_scale & (select_scale - 1) or not (
            1 < select_scale < trained_scale):
        raise ValueError(
            f"net_scale={trained_scale} serves power-of-2 scales "
            f"2..{trained_scale // 2}, got {select_scale}")
    level = int(math.log2(select_scale)) - 1
    if output_u8:
        from sr.quant import to_u8 as _post
    else:
        def _post(y):
            return y
    return jax.jit(lambda x: _post(model.apply(
        variables, x, train=False, all_scales=True)[level]))


@functools.lru_cache(maxsize=8)
def _load(model_name: str, params_path: str, params_mtime: float,
          scale_factor: int, num_channels: int | None, dtype: str,
          fused: bool, quantize: bool | str = False,
          output_u8: bool = False, calib_headroom: float = 1.25,
          select_scale: int | None = None):
    # params_mtime keys the cache so a re-exported file at the same path
    # is picked up instead of serving stale weights
    del params_mtime
    spec = get_spec(model_name)
    channels = num_channels or spec.default_channels
    cfg = SRConfig(model_name=model_name, scale_factor=scale_factor,
                   num_channels=channels, dtype=dtype)
    model = spec.make_model(cfg)
    params, batch_stats = load_params(params_path)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    if select_scale is not None and select_scale != scale_factor:
        if quantize:
            # same contract as sr.export._build_predict (quantize
            # branch): the int8 rewrites target the final single-output
            # tail, not a deep-supervised intermediate level — refusing
            # beats silently serving the float exact graph under a
            # --quantize flag the operator believes is active
            raise ValueError(
                "net_scale (pyramid level serving) does not compose "
                "with quantize — serve the exact level graph "
                "(drop --quantize) or the full-scale output")
        # fused=True is a where-supported hint (make_serving_predict
        # runs the exact graph for models without a PS tail); pyramid
        # models (LapSRN) have no fused tail, so level serving under
        # the serve default fused=True is the exact level graph — NOT
        # an error (a 400 here made every default-flag /upscale fail)
        fn = make_pyramid_level_predict(model, variables, spec,
                                        scale_factor, select_scale,
                                        output_u8=output_u8)
        return spec, channels, fn

    fn = make_serving_predict(model, variables, fused, quantize,
                              output_u8=output_u8,
                              calib_headroom=calib_headroom)
    return spec, channels, fn


def upscale(
    img: np.ndarray,
    model_name: str,
    params_path: str,
    scale_factor: int = 4,
    num_channels: int | None = None,
    dtype: str = "bfloat16",
    tile: int | None = 256,
    fused: bool = False,
    quantize: bool | str = False,
    color_space: str = "rgb",
    output_u8: bool = True,
    calib_headroom: float = 1.25,
    self_ensemble: bool = False,
    net_scale: int | None = None,
) -> np.ndarray:
    """Super-resolve a uint8 (H, W[, C]) image → uint8 (rH, rW, C).

    ``tile``: route images larger than this through exact halo-tiled
    inference (None = always full-image). ``fused``: use the collapsed
    affine tail where the model supports it (interior-identical, faster;
    see sr/kernels/fused_tail.py). ``quantize``: int8 convs for the
    forward (sr.quant — ~0.007 dB, int8 weight literals in the
    executable; ``"static"`` calibrates activation scales on the first
    image and is the fast int8 mode, composing with ``fused=True``;
    ``calib_headroom`` multiplies the lazily-calibrated scales — the
    1.25 default buys clip margin against inputs hotter than the first
    image, cheap under per-channel scales).
    ``output_u8`` (default on): quantize to uint8 ON DEVICE
    (bit-equal to the host conversion, ¼ the device→host bytes; set
    False to reproduce the float-fetch behavior). ``color_space``
    declares how a
    3-channel ``img`` is encoded ('rgb' or 'ycbcr'); 1-channel models
    super-resolve the LUMA channel (converting from RGB when needed),
    merge bicubic-upscaled chroma back, and return the input encoding.
    3-channel models receive ``img`` as-is (feed them the space they
    were trained in). ``self_ensemble``: average the 8 D4 flip/rotation
    variants (the EDSR paper's '+' mode — 8 forwards for ~+0.1-0.3 dB;
    the mean is taken in f32 BEFORE any u8 output quantization).
    ``net_scale``: the scale the checkpoint was TRAINED at, when it
    differs from the requested ``scale_factor`` — pyramid models
    (LapSRN) then serve the matching intermediate level from the one
    trained net (e.g. ``scale_factor=2, net_scale=4``).
    """
    import os

    from sr.eval.metrics import rgb_to_ycbcr, ycbcr_to_rgb
    from sr.eval.tiling import RECEPTIVE_FIELD, tiled_predict

    spec, channels, fn = _load(
        model_name, params_path, os.path.getmtime(params_path),
        # with net_scale the model builds at its TRAINED scale and fn
        # selects the level producing the requested scale_factor
        net_scale or scale_factor, num_channels, dtype, fused, quantize,
        # ensemble members must stay float: averaging already-rounded u8
        # outputs loses up to half a grid step per member
        output_u8 and not self_ensemble,
        calib_headroom,
        select_scale=scale_factor if net_scale else None,
    )
    base_fn = fn
    if self_ensemble:
        from sr.eval.ensemble import make_self_ensemble_predict

        fn = make_self_ensemble_predict(fn, output_u8=output_u8)
    if img.ndim == 2:
        img = img[:, :, None]
    r = scale_factor
    h, w = img.shape[:2]

    # 1-channel models operate on luma: convert RGB input to YCbCr first
    to_rgb_out = False
    if channels == 1 and img.shape[-1] == 3 and color_space == "rgb":
        img = np.clip(
            np.round(np.asarray(rgb_to_ycbcr(img.astype(np.float32)))),
            0, 255,
        ).astype(np.uint8)
        to_rgb_out = True

    # one full-image bicubic upsample serves pre-upsample input AND the
    # chroma merge
    bc_full = None
    if spec.pre_upsample or (channels == 1 and img.shape[-1] == 3):
        bc_full = resize_bicubic_u8(img, (h * r, w * r))

    # out_factor = the NETWORK's output/input size ratio (1 for
    # pre-upsample nets; r otherwise) — deliberately not reusing the
    # ``net_scale`` parameter name, which means "scale the checkpoint
    # was trained at" and stays readable below
    if spec.pre_upsample:
        model_in = bc_full
        out_factor = 1
    else:
        model_in = img
        out_factor = r
    if channels == 1:
        net_in = model_in[..., :1]
    else:
        net_in = model_in if model_in.shape[-1] == 3 else np.repeat(
            model_in, 3, axis=2
        )
    x = net_in.astype(np.float32)[None] / 255.0

    if self_ensemble and quantize == "static" and hasattr(base_fn,
                                                          "calibrate"):
        # the lazy first-call calibration would see only the identity
        # member: rotated/flipped members' activation ranges can exceed
        # it and clip past the headroom (ADVICE r3). Calibrate on all 8
        # D4 variants up front (no-op if the cached fn is calibrated).
        # A tiled image calibrates on a tile-sized center crop — same
        # footprint as the forwards the tiled path will run.
        from sr.eval.ensemble import TRANSFORMS, transform

        cal = x
        if tile is not None and max(x.shape[1], x.shape[2]) > tile:
            ch = min(tile, x.shape[1])
            cw = min(tile, x.shape[2])
            top = (x.shape[1] - ch) // 2
            left = (x.shape[2] - cw) // 2
            cal = x[:, top:top + ch, left:left + cw]
        base_fn.calibrate([transform(cal, f, k) for f, k in TRANSFORMS])

    halo = RECEPTIVE_FIELD.get(model_name.lower(), 48)
    if tile is not None and max(x.shape[1], x.shape[2]) > tile:
        out = tiled_predict(fn, x, out_factor, tile=tile, halo=halo)
    else:
        out = fn(x)
    out = np.asarray(out)
    if out.dtype == np.uint8:  # device already quantized (output_u8)
        sr_u8 = out[0]
    else:
        sr_u8 = np.clip(np.round(out.astype(np.float32)[0] * 255.0),
                        0, 255).astype(np.uint8)

    if channels == 1 and img.shape[-1] == 3:
        # merge model luma with bicubic-upscaled chroma
        sr_u8 = np.concatenate([sr_u8[..., :1], bc_full[..., 1:]], axis=-1)
    if to_rgb_out:
        sr_u8 = np.clip(
            np.round(np.asarray(ycbcr_to_rgb(sr_u8.astype(np.float32)))),
            0, 255,
        ).astype(np.uint8)
    return sr_u8
