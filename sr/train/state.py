"""Train state: params + optimizer + BN stats + PRNG + step, checkpointable.

The reference checkpoints params only and cannot resume training
(reference: each wrapper's save_model/load_model — torch.save(state_dict)).
This state carries everything needed for exact resume (SURVEY §5).
"""

from __future__ import annotations

from typing import Any

import jax
from flax.training import train_state


class SRTrainState(train_state.TrainState):
    """TrainState + mutable batch stats + PRNG key."""

    batch_stats: Any = None
    rng: jax.Array = None
