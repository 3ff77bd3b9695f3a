from sr.eval.ensemble import make_self_ensemble_predict  # noqa: F401
from sr.eval.metrics import (  # noqa: F401
    psnr,
    shave,
    modulo_crop,
    calculate_valid_crop_size,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
