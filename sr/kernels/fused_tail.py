"""Collapse an affine upsampling tail into one conv + one pixel shuffle.

EDSR's tail — [conv64→256, d2s₂, conv64→256, d2s₂, conv64→3] — contains
NO activations (sr/models/edsr.py:Net.tail), so as a function it is
affine and translation-equivariant. Any such map factors as

    tail(y) = d2s_r( conv_SAME(y, K) + b )

with a small composite kernel K (S×S×C_in×C_out·r²). Evaluating that
single conv instead of the three-stage chain does ~10× fewer tail FLOPs
and never materializes the 2× / 4× intermediates.

K and b are extracted NUMERICALLY by impulse probing (no weight algebra
to maintain): b = tail(0) read at one interior phase cell; K's taps are
the tail's response to per-channel unit impulses.

Exactness: the composite equals the original wherever the receptive
field stays inside the image. At borders the original's per-stage
'SAME' zero padding injects zeros AFTER earlier biases, which a single
conv cannot reproduce — outputs differ in a band of ≤ S//2 · r output
pixels. Use for throughput-critical interior work (e.g. with
tiled_predict, whose halos make tile interiors exact) or where a border
band is acceptable; parity evals keep the exact path.
"""

from __future__ import annotations

import functools
import threading

import jax
import jax.numpy as jnp
import numpy as np

from sr.kernels.depth_to_space import depth_to_space_ref, space_to_depth


def extract_affine_conv(
    tail_fn,
    in_channels: int,
    scale_factor: int,
    support: int = 7,
    tol: float = 1e-5,
) -> tuple[np.ndarray, np.ndarray]:
    """Impulse-probe an affine ×r upsampler into (K, b).

    ``tail_fn``: (1, P, P, in_channels) float32 → (1, rP, rP, C_out).
    Returns ``K`` (S, S, in_channels, C_out·r²) float32 and ``b``
    (C_out·r²,) such that ``d2s_r(conv_SAME(y, K) + b) == tail_fn(y)``
    in the interior. Raises if energy remains outside the S×S support
    (support too small → not a local affine map of that radius).
    """
    with jax.default_matmul_precision("highest"):
        return _extract_affine_conv(tail_fn, in_channels, scale_factor,
                                    support, tol)


def _extract_affine_conv(tail_fn, in_channels, scale_factor, support, tol):
    # NOTE: runs under matmul precision 'highest' — TPU f32 convs
    # otherwise use bf16 passes, which would quantize the extracted taps
    # and trip the affineness check with pure rounding noise.
    r = scale_factor
    S = support
    c0 = S // 2
    P = 4 * S  # probe canvas: comfortably larger than the support
    p0 = P // 2

    # one compile for all ~C_in+2 probe forwards (the trace happens on
    # the first call, inside the matmul-precision context) — eager
    # probing costs a remote compile PER OP on the relay backend
    tail_fn = jax.jit(tail_fn)
    zeros = jnp.zeros((1, P, P, in_channels), jnp.float32)
    bias_map = np.asarray(tail_fn(zeros))  # (1, rP, rP, C_out)
    c_out = bias_map.shape[-1]
    bias_phases = space_to_depth(jnp.asarray(bias_map), r)[0]  # (P,P,C_out·r²)
    b = np.asarray(bias_phases[p0, p0])
    # affine check: bias must be spatially constant in the interior
    interior = np.asarray(bias_phases[c0 : P - c0, c0 : P - c0])
    if not np.allclose(interior, b, atol=1e-4):
        raise ValueError("tail is not translation-invariant affine (bias varies)")

    K = np.zeros((S, S, in_channels, c_out * r * r), np.float32)
    for ci in range(in_channels):
        y = zeros.at[0, p0, p0, ci].set(1.0)
        resp = np.asarray(space_to_depth(jnp.asarray(tail_fn(y)), r))[0]
        resp = resp - np.asarray(bias_phases)  # remove affine offset
        # conv_SAME: z[p,q] = Σ K[dy,dx] y[p+dy-c0, q+dx-c0]
        # with y = δ at p0 → z[p,q] = K[p0-p+c0, p0-q+c0]
        for a in range(S):
            for bb in range(S):
                K[a, bb, ci, :] = resp[p0 + c0 - a, p0 + c0 - bb, :]
        # energy outside the claimed support ⇒ support too small
        resp[p0 + c0 - (S - 1) : p0 + c0 + 1, p0 + c0 - (S - 1) : p0 + c0 + 1] = 0
        leak = np.abs(resp).max()
        if leak > tol:
            raise ValueError(
                f"impulse response leaks {leak:.2e} outside support {S} "
                f"(channel {ci}) — increase `support`"
            )

    # superposition check: impulse probing alone cannot certify
    # affineness (e.g. a ReLU that is inactive at zero/impulse inputs);
    # validate the composite against the tail on a random dense input.
    y = jax.random.uniform(jax.random.key(0), (1, P, P, in_channels))
    want = np.asarray(tail_fn(y))
    z = jax.lax.conv_general_dilated(
        y, jnp.asarray(K), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(b)
    got = np.asarray(depth_to_space_ref(z, r))
    m = c0 * r  # border band where per-stage padding legitimately differs
    err = np.abs(got[:, m:-m, m:-m] - want[:, m:-m, m:-m]).max()
    if err > 1e-3:
        raise ValueError(
            f"composite deviates {err:.2e} from the tail on a dense input — "
            "the tail is not affine (activation or norm inside?)"
        )
    return K, b


def make_fused_tail_predict(model, variables, support: int = 7):
    """Jitted EDSR-style forward with the tail collapsed to one conv.

    ``model`` must expose ``body``/``tail`` methods (sr/models/edsr.py).
    Interior-exact vs ``model.apply(variables, x)``; see module docstring
    for the border-band caveat.
    """
    r = model.scale_factor
    # probe an f32 clone: bf16 rounding noise would fail the affineness
    # superposition check and quantize the extracted taps
    model_f32 = model.clone(dtype=jnp.float32)

    def tail_f32(y):
        return model_f32.apply(variables, y, train=False, method="tail").astype(
            jnp.float32
        )

    K, b = extract_affine_conv(tail_f32, model.base_filter, r, support)
    K_j = jnp.asarray(K, model.dtype)
    b_j = jnp.asarray(b, jnp.float32)

    @jax.jit
    def predict(x):
        h = model.apply(variables, x, train=False, method="body")
        z = jax.lax.conv_general_dilated(
            h.astype(model.dtype), K_j, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b_j
        return depth_to_space_ref(z.astype(h.dtype), r)

    return predict


def make_fused_tail_predict_quant(model, variables, support: int = 7,
                                  calib_headroom: float = 1.0,
                                  output_u8: bool = False,
                                  calib_batches=None):
    """Fused affine tail + STATIC-int8 body: the fast serving composite.

    Body convs run s8xs8->s32 with calibrated per-tensor activation
    scales (sr.quant mode="static" — the requantize fuses into conv
    epilogues, measured 1.48x conv-level, scripts/bench_int8_conv.py);
    the collapsed tail conv runs int8 too (per-output-channel composite
    kernel, calibrated body-output scale). Calibration happens lazily on
    the FIRST batch, like ``make_quantized_predict(mode="static")``.
    Interior-exact up to the int8 grid; same border-band caveat as
    ``make_fused_tail_predict``.
    """
    from sr.quant import _EPS, quantized_apply

    r = model.scale_factor
    model_f32 = model.clone(dtype=jnp.float32)

    def tail_f32(y):
        return model_f32.apply(variables, y, train=False,
                               method="tail").astype(jnp.float32)

    K, b = extract_affine_conv(tail_f32, model.base_filter, r, support)
    b_j = jnp.asarray(b, jnp.float32)

    def _first_tail_conv_site() -> str | None:
        """Site key of the tail's first eligible conv — its calibrated
        input scale IS the body-output scale (an abstract eval_shape
        trace: no compile, no device work)."""
        from sr.quant import _eligible, _site_key

        import flax.linen as nn

        found: list[str] = []

        def probe(next_fun, args, kwargs, context):
            m = context.module
            if (not found and _eligible(m, args)
                    and context.method_name == "__call__"):
                found.append(_site_key(m))
            return next_fun(*args, **kwargs)

        with nn.intercept_methods(probe):
            jax.eval_shape(
                lambda z: model.apply(variables, z, train=False,
                                      method="tail"),
                jax.ShapeDtypeStruct((1, 4 * support, 4 * support,
                                      model.base_filter), jnp.float32))
        return found[0] if found else None

    state: dict = {}
    lock = threading.Lock()  # serve handler threads

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

    def _build(calib):
        if calib_batches is not None:  # corpus calibration (RESULTS.md)
            calib = list(calib_batches)
        from sr.quant import calibrate_scales_batches

        scales = calibrate_scales_batches(
            model, variables, calib, headroom=calib_headroom,
            train=False)
        site = _first_tail_conv_site()
        if site is not None and site in scales:
            s_h = scales[site]  # body output == first tail conv input
        else:  # fallback: one extra jitted body forward per calib batch
            body = jax.jit(lambda z: jnp.max(jnp.abs(model.apply(
                variables, z, train=False, method="body"
            ).astype(jnp.float32))))
            s_h = max(
                max(float(body(z)) for z in calib) / 127.0, _EPS)
        if np.ndim(s_h) == 1:  # per-channel: fold into K (see int8_conv)
            s_h = np.maximum(s_h, _EPS)
            Kf = K * np.asarray(s_h)[None, None, :, None]
        else:
            Kf = K * float(s_h)
        s_K = np.maximum(np.abs(Kf).max(axis=(0, 1, 2)) / 127.0, _EPS)
        qK_j = jnp.asarray(
            np.clip(np.round(Kf / s_K), -127, 127).astype(np.int8))
        s_out = jnp.asarray(s_K, jnp.float32)
        inv_s_h = jnp.asarray(1.0 / np.asarray(s_h, np.float32),
                              jnp.float32)

        @jax.jit
        def fn(x):
            h = quantized_apply(model, variables, x, scales=scales,
                                train=False, method="body")
            q_h = jnp.clip(
                jnp.round(h.astype(jnp.float32) * inv_s_h),
                -127, 127).astype(jnp.int8)
            z = jax.lax.conv_general_dilated(
                q_h, qK_j, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * s_out + b_j
            if output_u8:
                from sr.quant import to_u8

                # to_u8 is elementwise and d2s a permutation — quantize
                # PRE-shuffle so the d2s copy moves u8, not bf16/f32
                return depth_to_space_ref(to_u8(z), r)
            return depth_to_space_ref(z.astype(h.dtype), r)

        return fn

    return predict
