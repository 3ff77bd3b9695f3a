from sr.kernels.bicubic import (  # noqa: F401
    img_interp,
    resize2d,
    resize2d_unit,
    resize_matrix,
    pil_resize_exact_u8,
    precompute_coeffs,
)
from sr.kernels.depth_to_space import depth_to_space, space_to_depth  # noqa: F401
from sr.kernels.fused_tail import (  # noqa: F401
    extract_affine_conv,
    make_fused_tail_predict,
)
from sr.kernels.fused_resblock import fused_resblock, pack_weights  # noqa: F401
