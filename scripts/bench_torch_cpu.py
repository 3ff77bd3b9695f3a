"""Measured PyTorch-CPU EDSR ×4 anchor for bench.py's GPU estimate.

The reference repo publishes no benchmark and this environment has no
GPU, so bench.py's ``REF_GPU_MPS = 15.0`` is derived from a FLOP model
(EDSR-baseline ×4 ≈ 200 kFLOP per output pixel; ~12 TFLOP/s Titan-Xp at
~30% util → ~18 MP/s, rounded down to 15). This script pins the FLOP
model to a measured number: it runs the torch replica of the reference
EDSR topology (tests/torch_refnets.py:TorchEDSR) on this host's CPU and
reports output MP/s plus the implied achieved FLOP/s. Results are
recorded in BASELINE.md.

Usage: python scripts/bench_torch_cpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

LR_SIZE, SCALE, ITERS = 64, 4, 3
FLOP_PER_OUT_PX = 200e3  # EDSR-baseline x4 cost model (see bench.py)


def main() -> None:
    import torch

    from torch_refnets import TorchEDSR

    torch.manual_seed(0)
    net = TorchEDSR(c=3, f=64, blocks=16, r=SCALE).eval()
    x = torch.rand(1, 3, LR_SIZE, LR_SIZE)

    with torch.no_grad():
        net(x)  # warm-up
        t0 = time.perf_counter()
        for _ in range(ITERS):
            net(x)
        dt = (time.perf_counter() - t0) / ITERS

    out_px = (LR_SIZE * SCALE) ** 2
    mps = out_px / dt / 1e6
    print(json.dumps({
        "metric": "torch-CPU EDSR x4 inference (reference topology)",
        "mp_per_s": round(mps, 3),
        "sec_per_image": round(dt, 3),
        "threads": torch.get_num_threads(),
        "implied_gflop_per_s": round(mps * FLOP_PER_OUT_PX / 1e3, 1),
    }))


if __name__ == "__main__":
    main()
