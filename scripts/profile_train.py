"""Per-op attribution of the EDSR TRAINING step (VERDICT r3 next #2).

The forward serving path achieves ~76 TFLOP/s (PERF.md "Calibration");
training measures materially lower end-to-end (bench.py train axis), so
this script attributes device time across the fwd+bwd scan-K program to
find where the backward loses efficiency.

Usage: python scripts/profile_train.py [MODEL] [K] [TOPN]
Prints a JSON table of the top ops with per-iter ms and % of device
time; PERF.md records the analysis.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax

    from sr.data.datasets import SyntheticDataset
    from sr.data.pipeline import PatchPipeline
    from sr.models.registry import get_spec
    from sr.train.trainer import Trainer
    from sr.utils.config import SRConfig
    from sr.utils.profiling import op_profile

    name = sys.argv[1] if len(sys.argv) > 1 else "EDSR"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    topn = int(sys.argv[3]) if len(sys.argv) > 3 else 25

    spec = get_spec(name)
    channels = spec.default_channels
    cfg = SRConfig(model_name=name, scale_factor=4, crop_size=64,
                   batch_size=32, num_channels=channels, dtype="bfloat16")
    ds = SyntheticDataset(num_images=32, size=(160, 160), channels=3,
                          seed=100)
    images = [im if channels == 3 else im[..., :1]
              for im in (ds[i] for i in range(len(ds)))]
    pipe = PatchPipeline(images, crop_size=64, scale_factor=4,
                         batch_size=32, channels=channels,
                         pre_upsample=spec.pre_upsample)
    tr = Trainer(cfg)
    b0 = pipe(jax.random.key(0))
    state = tr.init_state(jax.random.key(1), b0[spec.input_key()][:1])
    step = tr.make_multi_step(pipe, K)

    # donation: profile via a fn that returns the new state (op_profile
    # syncs on a leaf) — thread state manually between calls
    holder = {"state": state.replace(rng=None), "rng": jax.random.key(2)}

    def run():
        s, r, m = step(holder["state"], holder["rng"], pipe.bank)
        holder["state"], holder["rng"] = s, r
        return m["loss"]

    prof = op_profile(lambda: run(), iters=3)
    out = {"model": name, "K": K,
           "programs": prof["programs"][:5],
           "top_ops": prof["ops"][:topn],
           "log_dir": prof["log_dir"]}
    print(json.dumps(out, indent=1), flush=True)


if __name__ == "__main__":
    main()
