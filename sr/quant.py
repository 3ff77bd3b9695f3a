"""Int8 post-training quantization for serving (dynamic-range PTQ).

TPU MXUs have an s8xs8 -> s32 systolic path at 2x the bf16 rate on
paper; measured on this v5-lite via XLA's conv lowering the end-to-end
throughput is ~parity with bf16 (PERF.md round-3 entry), so the shipped
win is FOOTPRINT, not speed: the executable embeds int8 weight literals
(weights halve vs bf16, quarter vs f32 — smaller artifacts, half the
weight-side HBM traffic) at a measured quality cost of ~0.007 dB. The
reference collection has no quantization story (reference: each
wrapper's ``test()`` serves fp32); this module adds one the TPU-native
way:

* **Weights**: per-output-channel symmetric int8, computed from the f32
  params at trace time — XLA constant-folds the rounding, so the
  executable embeds int8 literals and the HBM weight traffic halves.
* **Activations**: per-SAMPLE symmetric int8 with a *dynamic* scale
  (``amax/127`` over each batch element, computed on device per call).
  No calibration corpus needed, no accuracy cliff from a stale static
  range, and no cross-request coupling under serving micro-batching;
  the amax reduce is noise next to the conv it feeds.
* **Accumulation**: exact int32 (``preferred_element_type``), then one
  f32 rescale ``(s_x * s_w)`` + bias — the standard MXU int8 contract.

Mechanism: ``flax.linen.intercept_methods`` swaps every ``nn.Conv``
call for the int8 path *without touching any model code* — one
interceptor covers the whole zoo (SRCNN/VDSR/DRCN/ESPCN/EDSR/SRResNet/
SRGAN generators are pure-Conv). ``nn.ConvTranspose`` (FSRCNN's deconv,
LapSRN's pyramid) passes through in the compute dtype BY DEFAULT;
``quantize_deconv=True`` opts eligible deconv sites into the same int8
contract (``int8_deconv`` — measured in PERF.md "deconv int8" before
any default change).

Quality: dynamic per-tensor activation + per-channel weight int8 cost
a trained ESPCN 0.007 dB on its eval batch (measured; see PERF.md and
tests/test_quant.py). Use for serving, never for training. Exposed as
``quantize=True`` on sr.infer.upscale / sr.export.export_* and
``--quantize`` on sr.serve.
"""

from __future__ import annotations

from typing import Any

import threading

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-12


def _as_pair(v) -> tuple:
    if isinstance(v, int):
        return (v, v)
    return tuple(v)


def to_u8(y: jax.Array) -> jax.Array:
    """On-device [0,1]-float → uint8 image quantization, bit-equal to the
    host-side ``np.clip(np.round(sr*255), 0, 255).astype(uint8)`` that
    sr.infer/sr.serve otherwise apply (same f32 math, same half-to-even
    rounding). Emitting u8 from the serving program quarters the
    device→host bytes vs f32 (production PCIe/relay win) — measured in
    PERF.md "u8 serving output"."""
    return jnp.clip(jnp.round(y.astype(jnp.float32) * 255.0),
                    0, 255).astype(jnp.uint8)


def quantize_kernel(kernel: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: (kh, kw, cin, cout) f32 ->
    (int8 kernel, f32 per-channel scale[cout])."""
    k32 = kernel.astype(jnp.float32)
    s = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, _EPS)
    q = jnp.clip(jnp.round(k32 / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_activation(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-SAMPLE symmetric int8 with a dynamic (on-device) scale.

    The scale is reduced over every axis except batch (shape
    (B, 1, …, 1)) so one image's range never coarsens another's grid —
    essential under serve-side micro-batching, where concurrent
    requests share a dispatch and outputs must not depend on
    co-batched traffic."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(1, x32.ndim))
    s = jnp.max(jnp.abs(x32), axis=axes, keepdims=True) / 127.0
    s = jnp.maximum(s, _EPS)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _canonical_padding(padding):
    """Flax ``nn.Conv`` padding → a form ``lax.conv_general_dilated``
    accepts, or None when ineligible (CIRCULAR/CAUSAL need flax's
    manual pre-pad and must fall through to the f32 path)."""
    if isinstance(padding, str):
        return padding if padding in ("SAME", "SAME_LOWER", "VALID") else None
    if isinstance(padding, int):
        return ((padding, padding),) * 2
    try:
        return tuple(_as_pair(p) for p in padding)
    except TypeError:
        return None


def quantize_activation_static(x: jax.Array, scale
                               ) -> tuple[jax.Array, jax.Array]:
    """Symmetric int8 with a STATIC (calibrated) scale — a per-tensor
    float or a per-channel ``(C,)`` vector (broadcast over the last
    axis; a vector caller must fold the scales into the weights, see
    ``int8_conv``).

    The scale is a trace-time constant, so there is no on-device amax
    reduce and the round/clip/cast chain fuses into the epilogue of
    whatever produced ``x`` — this is what lets the int8 conv's 1.48x
    MXU win (scripts/bench_int8_conv.py) survive end-to-end instead of
    being eaten by two extra HBM passes per conv (the measured fate of
    the dynamic path, PERF.md round-3 int8 entry). Out-of-range
    activations saturate at +/-127 — graceful for PSNR, and the scale
    comes from a real forward (``calibrate_scales``)."""
    s = jnp.maximum(jnp.asarray(scale, jnp.float32), _EPS)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s),
                 -127, 127).astype(jnp.int8)
    return q, s


def _site_key(m: nn.Module) -> str:
    return "/".join(m.path)


def _eligible(m, args) -> bool:
    return (
        type(m) is nn.Conv
        and len(args) == 1
        and getattr(args[0], "ndim", 0) == 4
        and _as_pair(m.kernel_size)[0] == _as_pair(m.kernel_size)[1]
        and (m.kernel_dilation in (1, None) or
             _as_pair(m.kernel_dilation) == (1, 1))
        and (m.input_dilation in (1, None) or
             _as_pair(m.input_dilation) == (1, 1))
        and _canonical_padding(m.padding) is not None
    )


def _eligible_deconv(m, args) -> bool:
    """nn.ConvTranspose sites the int8 path covers (FSRCNN's 9x9/s4
    deconv, LapSRN's 4x4/s2 pyramid deconvs): square kernel, no
    dilation, SAME/VALID or explicit-pair padding (DeconvBlock's
    torch-exact geometry uses pairs), default kernel orientation."""
    if not (type(m) is nn.ConvTranspose
            and len(args) == 1
            and getattr(args[0], "ndim", 0) == 4
            and _as_pair(m.kernel_size)[0] == _as_pair(m.kernel_size)[1]
            and (m.kernel_dilation in (1, None) or
                 _as_pair(m.kernel_dilation) == (1, 1))
            and not m.transpose_kernel):
        return False
    if isinstance(m.padding, str):
        return m.padding in ("SAME", "VALID")
    try:
        tuple(_as_pair(p) for p in m.padding)
        return True
    except TypeError:
        return False


def _make_capture(model: nn.Module, per_channel: bool, apply_kwargs: dict):
    """Build the amax-capture forward for :func:`calibrate_scales`.
    ``variables`` is an ARGUMENT (not a closure constant) so one jitted
    program serves every same-shaped calibration batch."""

    def _capture(variables, x):
        captured: dict[str, jax.Array] = {}
        # convs inside lax/nn.scan bodies (DRCN's recursion) would
        # capture scan-body tracers that cannot escape their trace —
        # skip them by trace identity; those sites fall back to dynamic
        # scales at apply time
        outer_trace = getattr(x, "_trace", None)

        def interceptor(next_fun, args, kwargs, context):
            m = context.module
            if ((_eligible(m, args) or _eligible_deconv(m, args))
                    and context.method_name == "__call__"
                    and getattr(args[0], "_trace", None) is outer_trace):
                a32 = jnp.abs(args[0].astype(jnp.float32))
                if per_channel:
                    amax = jnp.max(a32, axis=tuple(range(a32.ndim - 1)))
                else:
                    amax = jnp.max(a32)
                k = _site_key(m)
                if k in captured:
                    amax = jnp.maximum(captured[k], amax)
                captured[k] = amax
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(interceptor):
            model.apply(variables, x, **apply_kwargs)
        return captured

    return _capture


# jitted capture programs keyed on (model, per_channel, apply_kwargs):
# wrapping a FRESH closure in jax.jit per calibrate_scales call meant
# corpus calibration (calibrate_scales_batches) and D4 calibration
# recompiled the identical forward once per batch — 40-200 s per remote
# compile in relay environments (round-4 review finding). flax Modules
# are frozen dataclasses (hashable); unhashable edge cases fall back to
# an uncached build at the call site.
_CAPTURE_CACHE: dict = {}
_CAPTURE_LOCK = threading.Lock()
# LRU bound: long-lived serving/zoo processes calibrating many model
# topologies must not accumulate compiled capture programs forever
# (ADVICE r4); 16 comfortably covers a whole-zoo run's distinct
# (model-config, per_channel, apply_kwargs) keys
_CAPTURE_CACHE_MAX = 16


def _capture_program(model: nn.Module, per_channel: bool,
                     apply_kw_items: tuple):
    key = (model, per_channel, apply_kw_items)
    with _CAPTURE_LOCK:
        fn = _CAPTURE_CACHE.get(key)  # may raise TypeError (unhashable)
        if fn is None:
            fn = jax.jit(
                _make_capture(model, per_channel, dict(apply_kw_items)))
            _CAPTURE_CACHE[key] = fn
        else:  # refresh recency (dict preserves insertion order)
            _CAPTURE_CACHE.pop(key)
            _CAPTURE_CACHE[key] = fn
        while len(_CAPTURE_CACHE) > _CAPTURE_CACHE_MAX:
            _CAPTURE_CACHE.pop(next(iter(_CAPTURE_CACHE)))
    return fn


def calibrate_scales(model: nn.Module, variables: dict, x: jax.Array,
                     headroom: float = 1.0, per_channel: bool = True,
                     **apply_kwargs) -> dict[str, Any]:
    """One jitted f32 forward that records each eligible conv site's
    input amax; returns ``{module-path: scale}`` for the static int8
    path. Sites visited more than once under one trace (shared/looped
    modules) keep the max. ``headroom`` multiplies every scale (1.0 =
    exact calibration amax; >1 trades grid resolution for clip
    margin).

    ``per_channel`` (default): the scale is a per-input-CHANNEL ``(C,)``
    vector instead of one float — strictly finer quantization at zero
    runtime cost, because ``int8_conv`` folds the channel scales into
    the (already per-output-channel) weight quantization and the
    activation quantize stays one fused elementwise op. This is what
    keeps static-mode PSNR at dynamic-mode level (per-tensor static
    measured up to −2.2 dB on trained EDSR whose channel ranges differ
    wildly — RESULTS.md int8 columns)."""
    try:
        fn = _capture_program(model, per_channel,
                              tuple(sorted(apply_kwargs.items())))
    except TypeError:  # unhashable model field / kwarg: uncached build
        fn = jax.jit(_make_capture(model, per_channel, apply_kwargs))
    out = fn(variables, x)
    # ONE device->host transfer for all sites: per-scalar float() would
    # pay the relay's ~25 ms round trip per conv site (~1 s on EDSR)
    keys = list(out)
    if not keys:
        return {}
    flat = np.asarray(jnp.concatenate(
        [out[k].reshape(-1) for k in keys]))
    scales: dict[str, Any] = {}
    pos = 0
    for k in keys:
        n = int(np.prod(out[k].shape, dtype=np.int64)) or 1
        v = flat[pos:pos + n] * (headroom / 127.0)
        pos += n
        scales[k] = (np.maximum(v, _EPS) if per_channel
                     else max(float(v[0]), _EPS))
    return scales


def calibrate_scales_batches(model: nn.Module, variables: dict,
                             batches, headroom: float = 1.0,
                             **apply_kwargs) -> dict[str, float]:
    """``calibrate_scales`` over an iterable of batches, keeping each
    site's max — use when one batch may under-represent the activation
    range (e.g. calibrating an export artifact on a handful of real
    images instead of serving's first request)."""
    out: dict[str, Any] = {}
    for x in batches:
        s = calibrate_scales(model, variables, x, headroom=headroom,
                             **apply_kwargs)
        for k, v in s.items():
            out[k] = np.maximum(out[k], v) if k in out else v
    if not out:
        raise ValueError("calibrate_scales_batches: empty batch iterable")
    return out


def _pallas_3x3_eligible(m: nn.Conv, padding) -> bool:
    """The Pallas im2col kernel covers exactly: 3x3, stride 1, SAME,
    no groups (sr/kernels/int8_conv.py)."""
    return (
        _as_pair(m.kernel_size) == (3, 3)
        and _as_pair(m.strides or 1) == (1, 1)
        and m.feature_group_count == 1
        and padding in ("SAME", ((1, 1), (1, 1)))
    )


def int8_conv(x: jax.Array, m: nn.Conv,
              static_scale=None,
              conv_backend: str = "xla") -> jax.Array:
    """Run a bound ``nn.Conv`` module's conv as s8 x s8 -> s32 with an
    f32 rescale; mirrors the module's geometry (strides/padding/groups)
    exactly. ``static_scale``: calibrated activation scale
    (constant-folded) — a per-tensor float, or a per-input-channel
    ``(C,)`` vector whose scales FOLD INTO the weight quantization
    (``q_x[c] ≈ x[c]/s_c`` against ``W'[..,c,..] = W·s_c`` keeps the
    product exact, so the dequant stays one per-output-channel
    multiply); None = dynamic per-sample scale.
    ``conv_backend``: "xla" (default) or "pallas" — routes eligible
    3x3/stride-1/SAME convs through the VMEM im2col kernel
    (sr/kernels/int8_conv.py; others fall back to XLA). On the CPU
    backend the Pallas path runs in interpret mode (test substrate)."""
    params = m.variables["params"]
    kernel = params["kernel"]
    if (static_scale is not None and np.ndim(static_scale) == 1
            and m.feature_group_count != 1):
        # grouped convs: channel→kernel-input mapping is not 1:1;
        # collapse to a conservative per-tensor scale instead
        static_scale = float(np.max(static_scale))
    if static_scale is not None and np.ndim(static_scale) == 1:
        s_c = jnp.asarray(np.maximum(static_scale, _EPS), jnp.float32)
        kernel = kernel.astype(jnp.float32) * s_c[None, None, :, None]
        q_w, s_w = quantize_kernel(kernel)
        q_x, _ = quantize_activation_static(x, s_c)
        s_x = jnp.float32(1.0)  # absorbed into the folded weights
    else:
        q_w, s_w = quantize_kernel(kernel)
        if static_scale is not None:
            q_x, s_x = quantize_activation_static(x, static_scale)
        else:
            q_x, s_x = quantize_activation(x)
    strides = _as_pair(m.strides or 1)
    padding = _canonical_padding(m.padding)
    if padding is None:
        raise ValueError(f"unsupported padding for int8 conv: {m.padding!r}")
    if conv_backend == "pallas" and _pallas_3x3_eligible(m, padding):
        from sr.kernels.int8_conv import conv3x3_int8_im2col

        y = conv3x3_int8_im2col(
            q_x, q_w, interpret=jax.default_backend() == "cpu")
    else:
        y = lax.conv_general_dilated(
            q_x, q_w, window_strides=strides, padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=m.feature_group_count,
            preferred_element_type=jnp.int32,
        )
    y = y.astype(jnp.float32) * (s_x * s_w)
    if m.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def int8_deconv(x: jax.Array, m: nn.ConvTranspose,
                static_scale=None) -> jax.Array:
    """Run a bound ``nn.ConvTranspose`` as s8 x s8 -> s32 + f32 rescale
    (``lax.conv_transpose`` keeps the module's exact geometry). Same
    scale contract as :func:`int8_conv`: per-input-channel vectors fold
    into the weight quantization; None = dynamic per-sample."""
    params = m.variables["params"]
    kernel = params["kernel"]
    if static_scale is not None and np.ndim(static_scale) == 1:
        s_c = jnp.asarray(np.maximum(static_scale, _EPS), jnp.float32)
        kernel = kernel.astype(jnp.float32) * s_c[None, None, :, None]
        q_w, s_w = quantize_kernel(kernel)
        q_x, _ = quantize_activation_static(x, s_c)
        s_x = jnp.float32(1.0)  # absorbed into the folded weights
    else:
        q_w, s_w = quantize_kernel(kernel)
        if static_scale is not None:
            q_x, s_x = quantize_activation_static(x, static_scale)
        else:
            q_x, s_x = quantize_activation(x)
    padding = (m.padding if isinstance(m.padding, str)
               else tuple(_as_pair(p) for p in m.padding))
    y = lax.conv_transpose(
        q_x, q_w, strides=_as_pair(m.strides or 1), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=False,
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_w)
    if m.use_bias:
        y = y + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _make_interceptor(scales: dict[str, float] | None,
                      conv_backend: str = "xla",
                      quantize_deconv: bool = False):
    def interceptor(next_fun, args, kwargs, context):
        m = context.module
        if _eligible(m, args) and context.method_name == "__call__":
            s = scales.get(_site_key(m)) if scales is not None else None
            return int8_conv(args[0], m, static_scale=s,
                             conv_backend=conv_backend)
        if (quantize_deconv and _eligible_deconv(m, args)
                and context.method_name == "__call__"):
            s = scales.get(_site_key(m)) if scales is not None else None
            return int8_deconv(args[0], m, static_scale=s)
        return next_fun(*args, **kwargs)

    return interceptor


def quantized_apply(model: nn.Module, variables: dict, x: jax.Array,
                    scales: dict[str, float] | None = None,
                    conv_backend: str = "xla",
                    quantize_deconv: bool = False,
                    **apply_kwargs) -> Any:
    """``model.apply`` with every eligible ``nn.Conv`` running int8.

    ``scales``: per-site static activation scales from
    ``calibrate_scales``; sites absent from the dict use the dynamic
    per-sample scale (None = fully dynamic). ``conv_backend``: see
    :func:`int8_conv`. ``quantize_deconv``: also run eligible
    ``nn.ConvTranspose`` sites (FSRCNN/LapSRN tails) as int8 — opt-in
    pending a measured win (VERDICT r3 next #8; default path passes
    deconvs through in the compute dtype)."""
    with nn.intercept_methods(
            _make_interceptor(scales, conv_backend, quantize_deconv)):
        return model.apply(variables, x, **apply_kwargs)


def make_quantized_predict(model: nn.Module, variables: dict,
                           mode: str = "dynamic",
                           calib_headroom: float = 1.0,
                           output_u8: bool = False,
                           calib_batches=None,
                           quantize_deconv: bool = False):
    """Jitted serving forward with int8 convs. ``variables`` are closed
    over, so XLA folds the weight quantization at compile time and the
    executable carries int8 weight literals.

    ``mode``:

    * ``"dynamic"`` — per-SAMPLE activation scales computed on device
      each call. Zero setup, outputs independent of co-batched traffic;
      throughput ~parity with bf16 (the amax reduce costs two HBM
      passes per conv).
    * ``"static"`` — scales calibrated ONCE on the first batch this
      predict fn sees (one extra jitted f32 forward), then
      constant-folded into every later trace. The requantize fuses
      into conv epilogues and the int8 MXU rate shows up end-to-end
      (scripts/bench_quant_e2e.py). Later inputs whose activations
      exceed the calibrated range saturate at the int8 grid edge —
      pass ``calib_batches`` (an iterable of representative batches)
      to calibrate on a CORPUS up front instead; single-image lazy
      calibration measured up to −3 dB on range-diverse data
      (RESULTS.md static-int8 matrix).
    """
    if mode not in ("dynamic", "static"):
        raise ValueError(f"unknown quantization mode: {mode!r}")
    post = to_u8 if output_u8 else (lambda y: y)
    if mode == "dynamic":
        return jax.jit(
            lambda x: post(quantized_apply(
                model, variables, x, quantize_deconv=quantize_deconv,
                train=False))
        )

    state: dict[str, Any] = {}
    lock = threading.Lock()  # sr.serve serves from handler threads

    def _make(scales):
        return jax.jit(
            lambda x: post(quantized_apply(
                model, variables, x, scales=scales,
                quantize_deconv=quantize_deconv, train=False)))

    if calib_batches is not None:
        state["fn"] = _make(calibrate_scales_batches(
            model, variables, calib_batches, headroom=calib_headroom,
            train=False))

    def predict(x):
        if "fn" not in state:
            with lock:
                if "fn" not in state:
                    state["fn"] = _make(calibrate_scales(
                        model, variables, x, headroom=calib_headroom,
                        train=False))
        return state["fn"](x)

    def calibrate(batches) -> None:
        """Eagerly calibrate on an iterable of batches (no-op once
        calibrated) — lets wrappers that feed TRANSFORMED inputs
        (e.g. the D4 self-ensemble) cover all variants' activation
        ranges instead of just the first call's (ADVICE r3)."""
        with lock:
            if "fn" not in state:
                state["fn"] = _make(calibrate_scales_batches(
                    model, variables, batches, headroom=calib_headroom,
                    train=False))

    predict.calibrate = calibrate
    return predict
