"""A/B: pre-shuffle training loss (cfg.preshuffle_loss) vs normal path.

Times ONE-dispatch scan-fused K-step programs (min-of-3 — the
method-of-record for training rates on this relay, PERF.md) for the two
tail-shuffle models, with the identical pipeline/batch/recipe in both
arms. The mode is loss/grad-exact (tests/test_train_fold.py); this
script answers the only remaining question — how much of the d2s layout
-copy share (~14% of the EDSR step in the round-4 backward attribution)
the fold actually buys back.

Usage: python scripts/bench_preshuffle.py [K] [MODELS...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from sr.data.datasets import SyntheticDataset
    from sr.data.pipeline import PatchPipeline
    from sr.models.registry import get_spec
    from sr.train.trainer import Trainer
    from sr.utils.config import SRConfig

    K = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    models = sys.argv[2:] or ["ESPCN", "EDSR"]

    ds = SyntheticDataset(num_images=32, size=(160, 160), channels=3,
                          seed=100)

    def timed_steps(cfg, spec, pipe):
        tr = Trainer(cfg)
        b0 = pipe(jax.random.key(0))
        state = tr.init_state(jax.random.key(1), b0[spec.input_key()][:1])
        step = tr.make_multi_step(pipe, K)
        state, rng, m = step(state, jax.random.key(2), pipe.bank)
        float(m["loss"])  # warm/compile (scalar fetch = relay-safe sync)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            state, rng, m = step(state, rng, pipe.bank)
            loss = float(m["loss"])
            times.append(time.perf_counter() - t0)
        return min(times), loss

    out = {"K": K, "crop": 64, "batch": 32}
    for name in models:
        spec = get_spec(name)
        channels = spec.default_channels
        images = [ds[i] if channels == 3 else ds[i][..., :1]
                  for i in range(len(ds))]
        pipe = PatchPipeline(images, crop_size=64, scale_factor=4,
                             batch_size=32, channels=channels,
                             pre_upsample=spec.pre_upsample,
                             random_scale_mode="batch")
        row = {}
        arms = [("normal", False), ("preshuffle", "last")]
        if spec.preshuffle_train_full is not None:
            arms.append(("preshuffle_full", "full"))
        for label, flag in arms:
            cfg = SRConfig(model_name=name, scale_factor=4, crop_size=64,
                           batch_size=32, num_channels=channels,
                           dtype="bfloat16", steps_per_epoch=K,
                           num_epochs=1, preshuffle_loss=flag)
            t, loss = timed_steps(cfg, spec, pipe)
            row[label] = {"steps_per_s": round(K / t, 1),
                          "loss": round(loss, 6)}
            print(f"[preshuffle-ab] {name} {label}: {K}/{t:.3f}s = "
                  f"{K / t:.1f} steps/s (loss {loss:.6f})", flush=True)
        row["speedup"] = round(
            row["preshuffle"]["steps_per_s"] / row["normal"]["steps_per_s"], 3
        )
        if "preshuffle_full" in row:
            row["speedup_full"] = round(
                row["preshuffle_full"]["steps_per_s"]
                / row["normal"]["steps_per_s"], 3)
        out[name] = row
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
