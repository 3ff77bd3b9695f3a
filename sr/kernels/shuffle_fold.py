"""Fold a conv THROUGH a preceding pixel-shuffle (phase decomposition).

The exact-graph upsampling tails run [conv → depth_to_space → (act) →
conv] chains (reference: base_networks.py:PSBlock stacks in
srgan.py/edsr.py Nets). The conv AFTER the shuffle is the expensive
part: it runs at r²× the pixels, and the FINAL conv of a tail has tiny
output width (N=3 RGB) — worst-case MXU lane utilization.

This module rewrites ``conv2d(depth_to_space(x, r), W)`` as
``depth_to_space(conv2d(x, W_folded), r)`` — the SAME function (exact,
borders included), but the conv now runs in PRE-shuffle layout:

  * r²× fewer rows (output pixels), r²× more channels — contraction and
    output widths multiply by r², turning lane-starved matmuls
    (N=3 → N=3r²) into MXU-shaped ones;
  * the intermediate post-shuffle tensor is never materialized at the
    upsampled resolution between the two ops.

Derivation: with output phase (α,β) ∈ r², post-conv tap (dy,dx), and
p the post-conv's padding (torch k//2 geometry):

  ay = α + dy - p  →  δy = floor(ay/r)  (pre-pixel offset),
                       iy = ay mod r     (phase row inside that pre-pixel)

  out_pre[y, x, n·r² + α·r + β]
      = Σ W[dy,dx,c,n] · x[y+δy, x+δx, c·r² + iy·r + ix]

so the folded kernel W_f has spatial taps δ ∈ [floor(-p/r),
floor((r-1+k-1-p)/r)] and channel map (c,iy,ix) → c·r²+iy·r+ix (torch
PixelShuffle order, matching sr/kernels/depth_to_space). W_f is
phase-block-sparse (each output phase reads only the taps its window
touches); the MXU computes it dense, which trades ≤(T·r/k)² more FLOPs
for full lane utilization — a win exactly when the original N is small
(measurements in PERF.md).

The elementwise activations between shuffle and conv (SRResNet's PReLU
with a single shared slope) commute with the shuffle, so chains fold as
act-then-d2s_conv.
"""

from __future__ import annotations

import threading

import numpy as np

import jax
import jax.numpy as jnp

from sr.kernels.depth_to_space import depth_to_space


def fold_shuffle_conv_kernel(
    kernel, r: int, padding: int | None = None
):
    """(k,k,C,N) post-shuffle conv kernel → (T,T,C·r²,N·r²) pre-shuffle.

    ``padding``: the post-conv's symmetric padding (default k//2 — the
    torch ``Conv2d(padding=k//2)`` geometry used across sr.nn.blocks).
    Returns ``(folded_kernel, delta_min)``; the folded conv needs input
    zero-padding of ``-delta_min`` before / ``T-1+delta_min`` after each
    spatial dim to reproduce the post-conv's zero padding exactly.
    """
    kernel = np.asarray(kernel)
    k, k2, c, n = kernel.shape
    assert k == k2, "square kernels only"
    p = k // 2 if padding is None else padding

    dmin = (0 - p) // r  # python floor division (negatives included)
    dmax = (r - 1 + k - 1 - p) // r
    t = dmax - dmin + 1

    wf = np.zeros((t, t, c * r * r, n * r * r), kernel.dtype)
    for alpha in range(r):
        for dy in range(k):
            ay = alpha + dy - p
            delta_y, iy = ay // r, ay % r
            for beta in range(r):
                for dx in range(k):
                    ax = beta + dx - p
                    delta_x, ix = ax // r, ax % r
                    wf[
                        delta_y - dmin,
                        delta_x - dmin,
                        iy * r + ix :: r * r,  # c·r² + iy·r + ix over c
                        alpha * r + beta :: r * r,  # n·r² + α·r + β over n
                    ] += kernel[dy, dx]
    return wf, dmin


def fold_bias(bias, r: int):
    """(N,) post-conv bias → (N·r²,) folded-conv bias (replicated)."""
    return np.repeat(np.asarray(bias), r * r)


def fold_shuffle_conv_kernel_jnp(kernel, r: int, padding: int | None = None):
    """Differentiable (traced) twin of :func:`fold_shuffle_conv_kernel`.

    Same scatter, but on a ``jnp`` kernel inside a jitted graph, so the
    fold can sit UNDER ``jax.value_and_grad`` with the parameters kept in
    the ORIGINAL basis: gradients flow back through the (collision-free)
    scatter to the unfolded weights, and the optimizer state never sees
    the folded layout. This is what lets training run its output conv in
    pre-shuffle space (the training-side d2s fold — PERF.md "known
    headroom") without touching checkpoints or Adam moments.

    Construction is scatter-free (round 5): inverting the fold map for
    a fixed output phase α gives dy = r·Δ + i + (p − α + r·dmin) — for
    each α the (Δ, i) tap table is one CONTIGUOUS window of the
    zero-padded kernel, reshaped (t, r). The whole folded kernel is
    therefore r static slices per spatial axis + one transpose/reshape
    (≈2 copies of the folded buffer, slice-gradient backward). The
    previous k²·r² strided ``.at[...].set`` chain serialized into
    full-buffer passes per update — on the full-tail training fold
    (256→1024-channel folded stages rebuilt from live params EVERY
    step) the scatters alone dominated the step (PERF.md round-5
    full-tail fold A/B).
    """
    k, k2, c, n = kernel.shape
    assert k == k2, "square kernels only"
    p = k // 2 if padding is None else padding

    dmin = (0 - p) // r
    dmax = (r - 1 + k - 1 - p) // r
    t = dmax - dmin + 1

    # per-phase window offsets into the dy axis; pad so every window
    # [off, off + r·t) is in range, with out-of-kernel taps ZERO
    offs = [p - a + r * dmin for a in range(r)]
    pb = max(0, -min(offs))
    pa = max(0, max(offs) + r * t - 1 - (k - 1))
    kp = jnp.pad(kernel, ((pb, pa), (pb, pa), (0, 0), (0, 0)))
    ky = kp.shape[0]
    # y axis: stack the r windows → (α, Δy, iy, dx_padded, c, n)
    w = jnp.stack([
        jax.lax.slice_in_dim(kp, o + pb, o + pb + r * t, axis=0)
        for o in offs
    ]).reshape(r, t, r, ky, c, n)
    # x axis likewise → (β, α, Δy, iy, Δx, ix, c, n)
    w = jnp.stack([
        jax.lax.slice_in_dim(w, o + pb, o + pb + r * t, axis=3)
        for o in offs
    ]).reshape(r, r, t, r, t, r, c, n)
    # → (Δy, Δx, c, iy, ix, n, α, β): channel-in c·r²+iy·r+ix,
    # channel-out n·r²+α·r+β (torch PixelShuffle order, as above)
    w = w.transpose(2, 4, 6, 3, 5, 7, 1, 0)
    return w.reshape(t, t, c * r * r, n * r * r), dmin


def make_folded_tail_predict(model, variables):
    """Jitted forward with the output conv folded through the last pixel
    shuffle. Works for both PSBlock-tailed zoo models:

      * SRResNet/SRGAN generator (sr/models/srresnet.py:Net) — PReLU
        after each stage; the single shared slope commutes with the
        shuffle, so the fold stays exact;
      * EDSR (sr/models/edsr.py:Net) — activation-free stages.

    EXACTLY equal to ``model.apply(variables, x, train=False)`` (borders
    included — unlike EDSR's interior-exact affine collapse,
    sr/kernels/fused_tail.py). The point is the final conv: its tiny
    output width (N=3 RGB) at full output resolution gets a pathological
    XLA lowering on TPU (54% of SRResNet's exact forward device time;
    the fold halves the end-to-end forward — PERF.md "phase-folded
    output conv"); folded, it runs at the previous stage's resolution
    with r²× the lanes.
    """
    p = variables["params"]
    f = model.base_filter
    n_stages = len([k for k in p if k.startswith("upsample_")])
    stages = []
    for i in range(n_stages):
        blk = p[f"upsample_{i}"]
        slope = None
        na = blk.get("_NormAct_0")
        if na is not None and "PReLU_0" in na:
            slope = jnp.asarray(na["PReLU_0"]["slope"], jnp.float32)
        kern = blk["Conv_0"]["kernel"]
        r2 = kern.shape[-1] // f  # stage conv emits f·r² channels
        r = int(round(r2 ** 0.5))
        assert r * r * f == kern.shape[-1], (kern.shape, f)
        stages.append((
            jnp.asarray(kern, model.dtype),
            jnp.asarray(blk["Conv_0"]["bias"], model.dtype),
            slope,
            r,
        ))
    r_last = stages[-1][3]
    oc = p["out_conv"]
    if "kernel" not in oc:  # ConvBlock wrapping (EDSR) vs bare nn.Conv
        oc = oc["Conv_0"]
    wf, dmin = fold_shuffle_conv_kernel(
        np.asarray(oc["kernel"], np.float32), r_last
    )
    bf = fold_bias(np.asarray(oc["bias"], np.float32), r_last)
    wf_j = jnp.asarray(wf, model.dtype)
    bf_j = jnp.asarray(bf, jnp.float32)
    pad = -dmin

    def conv(x, w, b, padding):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), (padding, padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b

    def maybe_act(x, slope):
        if slope is None:
            return x
        s = slope.astype(x.dtype)
        return jnp.where(x >= 0, x, x * s)

    @jax.jit
    def predict(x):
        h = model.apply(variables, x, train=False, method="body")
        for w, b, s, r in stages[:-1]:
            k = w.shape[0]
            h = maybe_act(depth_to_space(conv(h, w, b, (k // 2, k // 2)), r), s)
        w, b, s, _ = stages[-1]
        k = w.shape[0]
        # last stage stays in PRE-shuffle layout: the (optional) PReLU
        # commutes with the shuffle, and the output conv is folded
        # through it
        a = maybe_act(conv(h, w, b, (k // 2, k // 2)), s)
        z = conv(a, wf_j, bf_j.astype(a.dtype), (pad, pad))
        return depth_to_space(z, r_last)

    return predict


def make_folded_tail_predict_quant(model, variables,
                                   calib_headroom: float = 1.0,
                                   output_u8: bool = False,
                                   calib_batches=None):
    """Static-int8 body + int8 stage convs + int8 PHASE-FOLDED output
    conv: the fast int8 serving composite for activation-bearing PS
    tails (SRResNet/SRGAN — reference srgan.py:Net — whose PReLU stages
    make the affine collapse of sr/kernels/fused_tail.py inapplicable).

    Function-exact to ``make_folded_tail_predict`` up to the int8 grid
    (borders included — the fold itself is exact): body convs run via
    ``sr.quant.quantized_apply`` with calibrated per-tensor scales, the
    stage convs and the folded output conv run s8×s8→s32 by hand. The
    folded conv's input is the PRE-shuffle activation — a permutation of
    the exact graph's out-conv input — so the out-conv site's calibrated
    scale transfers unchanged. Calibration happens lazily on the first
    batch, like ``make_quantized_predict(mode="static")``.
    """
    from sr.quant import (_EPS, quantize_activation,
                          quantize_activation_static, quantize_kernel,
                          quantized_apply)

    p = variables["params"]
    f = model.base_filter
    n_stages = len([k for k in p if k.startswith("upsample_")])
    if n_stages == 0:
        raise ValueError("model has no pixel-shuffle stages to fold")
    stages = []
    for i in range(n_stages):
        blk = p[f"upsample_{i}"]
        slope = None
        na = blk.get("_NormAct_0")
        if na is not None and "PReLU_0" in na:
            slope = jnp.asarray(na["PReLU_0"]["slope"], jnp.float32)
        kern = np.asarray(blk["Conv_0"]["kernel"], np.float32)
        r2 = kern.shape[-1] // f
        r = int(round(r2 ** 0.5))
        assert r * r * f == kern.shape[-1], (kern.shape, f)
        stages.append((kern,
                       jnp.asarray(blk["Conv_0"]["bias"], jnp.float32),
                       slope, r, f"upsample_{i}/Conv_0"))
    r_last = stages[-1][3]
    oc, oc_site = p["out_conv"], "out_conv"
    if "kernel" not in oc:  # ConvBlock wrapping (EDSR) vs bare nn.Conv
        oc, oc_site = oc["Conv_0"], "out_conv/Conv_0"
    wf, dmin = fold_shuffle_conv_kernel(
        np.asarray(oc["kernel"], np.float32), r_last)
    t = wf.shape[0]
    pad_lo, pad_hi = -dmin, t - 1 + dmin
    bf_j = jnp.asarray(fold_bias(np.asarray(oc["bias"], np.float32),
                                 r_last), jnp.float32)

    def maybe_act(x, slope):
        if slope is None:
            return x
        s = slope.astype(x.dtype)
        return jnp.where(x >= 0, x, x * s)

    state: dict = {}
    lock = threading.Lock()  # sr.serve serves from handler threads

    def _build(calib):
        if calib_batches is not None:  # corpus calibration (RESULTS.md)
            calib = list(calib_batches)
        from sr.quant import calibrate_scales_batches

        scales = calibrate_scales_batches(
            model, variables, calib, headroom=calib_headroom,
            train=False)

        def prep(kern, s_x):
            """Quantize one hand-run conv for its calibrated input scale:
            per-channel vectors fold into the weights (sr.quant.int8_conv
            derivation), so the dequant is one per-out-channel multiply."""
            if s_x is not None and np.ndim(s_x) == 1:
                s_c = np.maximum(np.asarray(s_x, np.float32), _EPS)
                q_w, s_w = quantize_kernel(
                    jnp.asarray(kern * s_c[None, None, :, None]))
                return q_w, s_w, jnp.asarray(s_c, jnp.float32)
            q_w, s_w = quantize_kernel(jnp.asarray(kern))
            return q_w, s_w, s_x  # float or None (dynamic)

        def int8_conv_static(x, q_w, s_w, bias, s_x, padding):
            if s_x is None:  # site missed by calibration: per-sample
                q_x, s_xj = quantize_activation(x)
                mult = s_xj * s_w
            elif getattr(s_x, "ndim", 0) == 1:  # folded per-channel
                q_x, _ = quantize_activation_static(x, s_x)
                mult = s_w
            else:
                q_x, s_xj = quantize_activation_static(x, float(s_x))
                mult = s_xj * s_w
            y = jax.lax.conv_general_dilated(
                q_x, q_w, (1, 1), (padding, padding),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * mult + bias
            return y.astype(x.dtype)

        qstages = [(prep(kern, scales.get(site)), b, slope, r)
                   for kern, b, slope, r, site in stages]
        s_oc = scales.get(oc_site)
        if s_oc is not None and np.ndim(s_oc) == 1:
            # the out-conv site calibrates POST-shuffle channels (C);
            # the folded conv's input has C·r² pre-shuffle channels,
            # channel map (c,iy,ix) → c·r²+iy·r+ix — each post channel's
            # amax bounds its whole r² phase group, so repeat is exact
            # (conservative within the group)
            s_oc = np.repeat(np.asarray(s_oc, np.float32), r_last * r_last)
        q_wf3 = prep(wf, s_oc)

        @jax.jit
        def fn(x):
            h = quantized_apply(model, variables, x, scales=scales,
                                train=False, method="body")
            for (q_w, s_w, s_x), b, slope, r in qstages[:-1]:
                k = q_w.shape[0]
                h = maybe_act(depth_to_space(int8_conv_static(
                    h, q_w, s_w, b, s_x, (k // 2, k // 2)), r), slope)
            (q_w, s_w, s_x), b, slope, _ = qstages[-1]
            k = q_w.shape[0]
            # last stage stays PRE-shuffle (PReLU commutes with d2s);
            # the output conv is folded through the shuffle
            a = maybe_act(int8_conv_static(
                h, q_w, s_w, b, s_x, (k // 2, k // 2)), slope)
            z = int8_conv_static(a, q_wf3[0], q_wf3[1], bf_j, q_wf3[2],
                                 (pad_lo, pad_hi))
            if output_u8:
                from sr.quant import to_u8

                # to_u8 is elementwise and d2s a permutation — quantize
                # PRE-shuffle so the d2s copy moves u8, not bf16/f32
                return depth_to_space(to_u8(z), r_last)
            return depth_to_space(z, r_last)

        return fn

    def predict(x):
        if "fn" not in state:
            with lock:
                if "fn" not in state:
                    state["fn"] = _build([x])
        return state["fn"](x)

    def calibrate(batches) -> None:
        """Eagerly calibrate on an iterable of batches (no-op once
        calibrated) — see sr.quant.make_quantized_predict.calibrate."""
        with lock:
            if "fn" not in state:
                state["fn"] = _build(list(batches))

    predict.calibrate = calibrate
    return predict


def d2s_conv(
    x: jax.Array,
    kernel,
    r: int,
    bias=None,
    padding: int | None = None,
) -> jax.Array:
    """``conv2d(depth_to_space(x, r), kernel) [+ bias]`` computed in
    pre-shuffle layout. Exact (borders included): zero-padding pre-shuffle
    pixels is zero-padding post-shuffle pixels under the shuffle.

    x: (B, H, W, C·r²); kernel: (k, k, C, N) with torch k//2 padding by
    default. Returns (B, H·r, W·r, N).
    """
    wf, dmin = fold_shuffle_conv_kernel(kernel, r, padding)
    t = wf.shape[0]
    pad_lo, pad_hi = -dmin, t - 1 + dmin
    y = jax.lax.conv_general_dilated(
        x,
        jnp.asarray(wf, x.dtype),
        window_strides=(1, 1),
        padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + jnp.asarray(fold_bias(bias, r), y.dtype)
    return depth_to_space(y, r)
