"""VDSR cap isolation (VERDICT r2 weak #5 / next-round #6).

VDSR lands last in the trained zoo at every scale (RESULTS.md), under
SRCNN — inverting the papers' ordering. Suspected cause: the reference
recipe's lr/10-every-20-epochs freezing learning (by epoch 60 the lr is
1e-4 of a 20-layer SGD net that started at 0.1). This script isolates
recipe vs implementation with measured arms on the SAME 20k-step /
256-image synthetic corpus setup as the zoo runs:

  reference   — the recipe as shipped (lr 0.1, /10 every 20 epochs,
                θ=0.4 adjustable clip)
  plateau10x  — identical but the decay period stretched 10× (no decay
                inside the 100-epoch run): is the schedule the cap?
  clip_x      — clip-threshold sweep at the reference schedule: is the
                θ/lr global-norm clip interacting with SGD the cap?

Usage: python scripts/ablate_vdsr.py [--steps 20000] [--corpus 256]
Appends one JSON row per arm to results_vdsr_ablation.json.
"""

import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax


def run_arm(name: str, steps: int, corpus: int, scale: int,
            decay_epochs: int = 20, clip_theta: float = 0.4) -> dict:
    from sr.data.datasets import SyntheticDataset, get_test_set
    from sr.data.pipeline import build_patch_pipeline
    from sr.eval.runner import evaluate
    from sr.models.registry import get_spec
    from sr.train.optim import vdsr_sgd
    from sr.train.trainer import Trainer
    from sr.utils.config import SRConfig

    spec = get_spec("VDSR")
    spec = dataclasses.replace(
        spec,
        make_tx=lambda cfg: vdsr_sgd(
            cfg.effective_lr, cfg.steps_per_epoch,
            decay_epochs=decay_epochs, clip_theta=clip_theta,
        ),
    )
    spe = min(steps, 200)
    cfg = SRConfig(
        model_name="VDSR", scale_factor=scale,
        crop_size=(64 // scale) * scale, batch_size=32, num_channels=1,
        dtype="bfloat16", steps_per_epoch=spe,
        num_epochs=max(1, steps // spe), steps_per_dispatch=100,
    )
    train_set = SyntheticDataset(num_images=corpus, size=(160, 160),
                                 channels=3, seed=100)
    images = [train_set[i][..., :1] for i in range(len(train_set))]
    pipe = build_patch_pipeline(cfg, spec, images)
    rng = jax.random.key(0)
    b0 = pipe(rng)
    t0 = time.time()
    tr = Trainer(cfg, spec=spec)
    state = tr.init_state(rng, b0[spec.input_key()][:1])
    state = tr.fit(state, pipe)
    pj = tr.make_predict_fn()
    res = evaluate(
        lambda x: pj(state.params, state.batch_stats, x),
        get_test_set("./data", "synthetic"), scale, channels=1,
        pre_upsample=True, dataset_name="synthetic", color_space="rgb",
    )
    out = {
        "arm": name, "steps": steps, "decay_epochs": decay_epochs,
        "clip_theta": clip_theta, "train_s": round(time.time() - t0, 1),
        **res.summary(),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--corpus", type=int, default=256)
    p.add_argument("--scale_factor", type=int, default=4)
    p.add_argument("--out", default="results_vdsr_ablation.json")
    p.add_argument("--arms", nargs="*", default=None)
    a = p.parse_args()

    arms = {
        "reference": dict(),
        "plateau10x": dict(decay_epochs=200),
        "clip_0.05": dict(clip_theta=0.05),
        "clip_4.0": dict(clip_theta=4.0),
        # refinement round: bracket the clip sweet spot + combine winners
        "clip_0.01": dict(clip_theta=0.01),
        "clip_0.1": dict(clip_theta=0.1),
        "clip_0.05_plateau": dict(clip_theta=0.05, decay_epochs=200),
    }
    # append semantics: a later refinement round must not truncate the
    # earlier measured arms in the same results file
    import os

    rows = []
    if os.path.exists(a.out):
        with open(a.out) as f:
            rows = json.load(f)
    for name, kw in arms.items():
        if a.arms and name not in a.arms:
            continue
        rows = [r for r in rows if r.get("arm") != name]  # re-run replaces
        rows.append(run_arm(name, a.steps, a.corpus, a.scale_factor, **kw))
    with open(a.out, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
