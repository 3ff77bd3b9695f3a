"""Microbenchmark: post-shuffle tail convs, exact vs phase-folded.

Measures the candidates for sr/kernels/shuffle_fold.py:d2s_conv on the
real chip (marginal Δwork/Δtime between two batch sizes — relay-safe,
see bench.py). Each case computes the SAME function two ways:

  * exact  — depth_to_space(x, r) then the conv at upsampled resolution
  * folded — d2s_conv: folded conv in pre-shuffle layout, then shuffle

Cases (EDSR/SRResNet ×4 tails, 128² body resolution, bf16):
  srresnet-final: 9×9 conv 64→3 @512² (r=2 fold → 5×5 256→12 @256²)
  edsr-final:     3×3 conv 64→3 @512² (r=2 fold → 3×3 256→12 @256²)
  edsr-mid:       3×3 conv 64→256 @256² (r=2 fold → 3×3 256→1024 @128²)

Usage: python scripts/bench_tail_fold.py [B_SMALL B_LARGE] [--full]
(prints one JSON line per case; --full additionally times the whole
SRResNet forward exact-graph vs folded-tail)
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, ".")

B_SMALL, B_LARGE, ITERS = 16, 32, 5
if len(sys.argv) >= 3 and sys.argv[1].isdigit() and sys.argv[2].isdigit():
    B_SMALL, B_LARGE = int(sys.argv[1]), int(sys.argv[2])


def _timed(fn, x, iters=ITERS):
    float(fn(x))  # warm/compile
    t0 = time.perf_counter()
    vals = [fn(x) for _ in range(iters)]
    for v in vals:
        float(v)
    return (time.perf_counter() - t0) / iters


def _marginal(fn, make_x):
    times = {}
    for b in (B_SMALL, B_LARGE):
        x = make_x(b)
        for attempt in range(3):
            try:
                times[b] = _timed(fn, x)
                break
            except Exception as e:  # noqa: BLE001
                print(f"[tailbench] b{b} attempt {attempt}: {e}", file=sys.stderr)
                time.sleep(5)
        else:
            raise RuntimeError("failed after retries")
    dt = times[B_LARGE] - times[B_SMALL]
    return dt / (B_LARGE - B_SMALL) if dt > 1e-4 else times[B_LARGE] / B_LARGE


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sr.kernels.depth_to_space import depth_to_space
    from sr.kernels.shuffle_fold import fold_shuffle_conv_kernel

    rng = np.random.default_rng(0)

    def run_case(name, pre_hw, crr, k, c, n, r):
        w = rng.standard_normal((k, k, c, n)).astype(np.float32) * 0.05
        wf, dmin = fold_shuffle_conv_kernel(w, r)
        pad = -dmin
        wj = jnp.asarray(w, jnp.bfloat16)
        wfj = jnp.asarray(wf, jnp.bfloat16)
        p = k // 2

        @jax.jit
        def exact(x):
            z = depth_to_space(x, r)
            y = jax.lax.conv_general_dilated(
                z, wj, (1, 1), ((p, p), (p, p)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))

        @jax.jit
        def folded(x):
            y = jax.lax.conv_general_dilated(
                x, wfj, (1, 1), ((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(depth_to_space(y, r).astype(jnp.float32))

        key = jax.random.key(1)
        make_x = functools.partial(
            lambda b: jax.random.normal(
                key, (b, pre_hw, pre_hw, crr), jnp.bfloat16)
        )
        t_e = _marginal(exact, make_x)
        t_f = _marginal(folded, make_x)
        print(json.dumps({
            "case": name,
            "exact_ms_per_img": round(t_e * 1e3, 3),
            "folded_ms_per_img": round(t_f * 1e3, 3),
            "speedup": round(t_e / t_f, 2),
            "folded_kernel": list(wf.shape),
        }), flush=True)

    def summed(fn):
        @jax.jit
        def g(x):
            return jnp.sum(fn(x).astype(jnp.float32))
        return g

    def run_full(model_name: str, lr_hw: int = 128):
        """Whole ×4 forward: exact graph vs folded-tail (vs affine-fused
        where the tail is activation-free)."""
        from sr.kernels.shuffle_fold import make_folded_tail_predict
        from sr.models.registry import get_spec
        from sr.utils.config import SRConfig

        cfg = SRConfig(model_name=model_name, num_channels=3,
                       scale_factor=4, dtype="bfloat16")
        model = get_spec(model_name).make_model(cfg)
        x0 = jnp.zeros((1, lr_hw, lr_hw, 3), jnp.float32)
        variables = jax.jit(
            model.init, static_argnames=("train",)
        )(jax.random.key(0), x0, train=False)

        fns = {
            "exact": jax.jit(lambda x: model.apply(variables, x, train=False)),
            "folded": make_folded_tail_predict(model, variables),
        }
        try:
            from sr.kernels.fused_tail import make_fused_tail_predict

            fns["affine_fused"] = make_fused_tail_predict(model, variables)
        except (ValueError, KeyError):
            pass  # activation-bearing tail: affine collapse doesn't apply

        key = jax.random.key(2)
        make_x = functools.partial(
            lambda b: jax.random.normal(
                key, (b, lr_hw, lr_hw, 3), jnp.bfloat16))
        out = {"case": f"full-{model_name.lower()}"}
        for name, fn in fns.items():
            out[f"{name}_ms_per_img"] = round(
                _marginal(summed(fn), make_x) * 1e3, 3)
        out["fold_speedup"] = round(
            out["exact_ms_per_img"] / out["folded_ms_per_img"], 2)
        print(json.dumps(out), flush=True)

    if "--full" in sys.argv:
        run_full("SRResNet")
        run_full("EDSR")
        return

    # (name, pre-shuffle HW, pre-shuffle channels, k, post C, N, r)
    run_case("srresnet-final", 256, 256, 9, 64, 3, 2)
    run_case("edsr-final", 256, 256, 3, 64, 3, 2)
    run_case("edsr-mid", 128, 256, 3, 64, 256, 2)


if __name__ == "__main__":
    main()
