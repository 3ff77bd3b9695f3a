from sr.train.losses import (  # noqa: F401
    mse_loss,
    l1_loss,
    charbonnier_loss,
    recursive_supervision_loss,
)
from sr.train.state import SRTrainState  # noqa: F401
