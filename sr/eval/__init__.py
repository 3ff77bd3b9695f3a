from sr.eval.metrics import (  # noqa: F401
    psnr,
    shave,
    modulo_crop,
    calculate_valid_crop_size,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)
