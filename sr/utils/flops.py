"""Analytic conv FLOP counting for throughput reporting.

The serving cost model (BASELINE.md: EDSR x4 ≈ 200 kFLOP/output px) is
hand-derived; this module generalizes it so bench.py can report achieved
model-TFLOP/s for TRAINING too (VERDICT r3 next #2). Counting is
model-agnostic: one abstract trace (``jax.eval_shape`` — no compile, no
device work) with a ``flax.linen.intercept_methods`` hook records every
``nn.Conv``/``nn.ConvTranspose`` call's geometry.

Convention: 1 MAC = 2 FLOPs; a conv's forward cost is
``2 * out_pixels * kh * kw * cin * cout / groups`` (for ConvTranspose
the same formula over its INPUT pixels — each input pixel scatters a
kh*kw*cin*cout stencil). Elementwise/norm work is ignored (<1% of an SR
net's cost, and the MXU is what throughput claims are about).

Training cost uses the standard fwd+bwd multiplier: backward computes
grads w.r.t. both inputs and weights, each a conv-sized contraction, so
``train ≈ 3 x forward``.

Caveat: modules executed under ``lax.scan``/``nn.scan`` are traced once,
so recursive nets (DRCN) undercount by the recursion factor — callers
that need those must scale externally.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import numpy as np


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def conv_forward_flops(model: nn.Module, variables: dict, x_shape,
                       dtype=np.float32, **apply_kwargs) -> int:
    """Total conv FLOPs of one forward pass on a ``x_shape`` batch."""
    total = 0

    def interceptor(next_fun, args, kwargs, context):
        nonlocal total
        m = context.module
        out = next_fun(*args, **kwargs)
        if (type(m) in (nn.Conv, nn.ConvTranspose)
                and context.method_name == "__call__"
                and len(args) == 1 and hasattr(args[0], "shape")):
            kh, kw = _pair(m.kernel_size)
            cin = args[0].shape[-1]
            cout = m.features
            groups = getattr(m, "feature_group_count", 1) or 1
            ref = args[0] if type(m) is nn.ConvTranspose else out
            pixels = int(np.prod(ref.shape[:-1]))  # batch * spatial
            total += 2 * pixels * kh * kw * (cin // groups) * cout
        return out

    def fwd(x):
        with nn.intercept_methods(interceptor):
            return model.apply(variables, x, **apply_kwargs)

    jax.eval_shape(fwd, jax.ShapeDtypeStruct(tuple(x_shape), dtype))
    return total


def train_step_flops(model: nn.Module, variables: dict, x_shape,
                     **apply_kwargs) -> int:
    """fwd + bwd conv FLOPs of one train step (3x forward)."""
    return 3 * conv_forward_flops(model, variables, x_shape,
                                  **apply_kwargs)
