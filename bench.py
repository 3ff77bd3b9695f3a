"""Benchmark: flagship ×4 SR inference throughput (megapixels/sec/chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Metric: EDSR-baseline (16 resblocks, 64 filters) ×4 super-resolution,
bfloat16, batch 8 of 128×128 LR inputs → 512×512 outputs, steady-state
OUTPUT megapixels per second on one chip.

vs_baseline: ratio against the PyTorch reference on a paper-era GPU.
The reference repo publishes no benchmark (SURVEY §6) and this
environment has no GPU, so the baseline constant is an ESTIMATE of the
torch/cuDNN fp32 reference at ~15 MP/s (EDSR ×4 ≈ 200 kFLOP/output px;
~12 TFLOP/s Titan-Xp at ~30% util → see BASELINE.md). The target from
BASELINE.json.north_star is ≥5× ⇒ vs_baseline ≥ 5.0.
"""

from __future__ import annotations

import json
import sys
import time

REF_GPU_MPS = 15.0  # estimated PyTorch-on-GPU reference (see docstring)

BATCH, LR_SIZE, SCALE = 8, 128, 4
WARMUP, ITERS = 3, 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from sr.models.registry import get_spec
    from sr.utils.config import SRConfig

    cfg = SRConfig(model_name="EDSR", num_channels=3, scale_factor=SCALE,
                   num_resblocks=16, base_filter=64, dtype="bfloat16")
    spec = get_spec(cfg.model_name)
    model = spec.make_model(cfg)

    key = jax.random.key(0)
    x = jax.random.uniform(key, (BATCH, LR_SIZE, LR_SIZE, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        key, x[:1], train=False
    )

    # NOTE: this environment's TPU is behind a relay where
    # block_until_ready does not synchronize and bulk D2H is very slow;
    # each forward therefore reduces to a scalar on device and timing
    # fetches the scalars (dispatch all → fetch all, so compute overlaps
    # and one relay round-trip is amortized over all iters).
    @jax.jit
    def forward(v, x):
        return jnp.sum(model.apply(v, x, train=False).astype(jnp.float32))

    for _ in range(WARMUP):
        float(forward(variables, x))
    t0 = time.perf_counter()
    vals = [forward(variables, x) for _ in range(ITERS)]
    for v_ in vals:
        float(v_)
    dt = time.perf_counter() - t0

    out_mp = BATCH * (LR_SIZE * SCALE) ** 2 / 1e6
    mps = out_mp * ITERS / dt
    print(
        f"[bench] EDSR x{SCALE} bf16 batch={BATCH} {LR_SIZE}->"
        f"{LR_SIZE * SCALE}: {ITERS} iters in {dt:.3f}s on "
        f"{jax.devices()[0].device_kind}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "EDSR x4 SR inference throughput (output MP/s, 1 chip)",
        "value": round(mps, 2),
        "unit": "MP/s",
        "vs_baseline": round(mps / REF_GPU_MPS, 2),
    }))


if __name__ == "__main__":
    main()
