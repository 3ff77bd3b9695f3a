"""Shared epoch-dispatch loop for the plain and GAN trainers.

One place owns the scan-fused-vs-single-step interleaving, the remainder
handling, and the logging cadence — previously duplicated (and already
drifting) between Trainer.fit and GANTrainer.fit.
"""

from __future__ import annotations

from typing import Callable

import jax


def dispatch_epoch(
    spe: int,
    k: int,
    log_every: int,
    rng: jax.Array,
    do_single: Callable[[jax.Array], dict],
    do_multi: Callable[[jax.Array], tuple[jax.Array, dict]] | None,
    log: Callable[[dict], None],
) -> jax.Array:
    """Run one epoch of ``spe`` steps.

    ``do_multi(rng) -> (rng, metrics)`` advances k steps in one dispatch
    (None → always single); ``do_single(subkey) -> metrics`` advances
    one. ``log`` fires on the single-step cadence ``log_every`` (scaled
    up to k for fused dispatches) and always at epoch end. Returns the
    advanced rng.
    """
    it = 0
    while it < spe:
        if do_multi is not None and spe - it >= k:
            rng, metrics = do_multi(rng)
            it += k
        else:
            rng, sub = jax.random.split(rng)
            metrics = do_single(sub)
            it += 1
        if it % max(log_every, k) < k or it >= spe:
            log(metrics)
    return rng
