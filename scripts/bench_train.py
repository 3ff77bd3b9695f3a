"""Training-throughput benchmark: scan-fused K-step programs (real chip).

Times ONE-dispatch K-step programs (min-of-3 repeats — the
method-of-record for training rates on this relay, PERF.md), and runs
two A/Bs:

  * sampler share — the same program with a constant batch instead of
    the on-device sampler (its Δ is the sampler's share of the step);
  * random_scale_mode — per-item (reference-faithful) vs per-batch
    scale draw (one resize branch instead of all six under vmap).

Usage: python scripts/bench_train.py [MODEL] [K]
"""

from __future__ import annotations

import json
import sys
import time
import types

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from sr.data.datasets import SyntheticDataset
    from sr.data.pipeline import PatchPipeline
    from sr.models.registry import get_spec
    from sr.train.trainer import Trainer
    from sr.utils.config import SRConfig

    model_name = sys.argv[1] if len(sys.argv) > 1 else "ESPCN"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    spec = get_spec(model_name)
    channels = spec.default_channels
    cfg = SRConfig(model_name=model_name, scale_factor=4, crop_size=64,
                   batch_size=32, num_channels=channels, dtype="bfloat16",
                   steps_per_epoch=K, num_epochs=1)
    ds = SyntheticDataset(num_images=32, size=(160, 160), channels=3,
                          seed=100)
    images = [ds[i] if channels == 3 else ds[i][..., :1]
              for i in range(len(ds))]

    def timed_steps(pipe_for_step, bank_pipe):
        tr = Trainer(cfg)
        b0 = bank_pipe(jax.random.key(0))
        state = tr.init_state(jax.random.key(1), b0[spec.input_key()][:1])
        step = tr.make_multi_step(pipe_for_step, K)
        state, rng, m = step(state, jax.random.key(2), bank_pipe.bank)
        float(m["loss"])  # warm/compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, rng, m = step(state, rng, bank_pipe.bank)
            float(m["loss"])
            times.append(time.perf_counter() - t0)
        return min(times)

    out = {"model": model_name, "K": K, "crop": 64, "batch": 32}
    for mode in ("item", "batch", "matrix"):
        pipe = PatchPipeline(images, crop_size=64, scale_factor=4,
                             batch_size=32, channels=channels,
                             pre_upsample=spec.pre_upsample,
                             random_scale_mode=mode)
        out[f"steps_per_s_{mode}"] = round(K / timed_steps(pipe, pipe), 1)

    # sampler share: constant batch, same step program shape
    pipe = PatchPipeline(images, crop_size=64, scale_factor=4,
                         batch_size=32, channels=channels,
                         pre_upsample=spec.pre_upsample)
    b0 = pipe(jax.random.key(0))
    fixed = types.SimpleNamespace(sample_fn=lambda bank, key: b0)
    t_fixed = timed_steps(fixed, pipe)
    t_full = K / out["steps_per_s_item"]
    out["steps_per_s_fixed_batch"] = round(K / t_fixed, 1)
    out["sampler_share_pct"] = round(100 * (t_full - t_fixed) / t_full, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
