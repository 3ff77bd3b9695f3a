"""Model zoo — importing this package registers every model spec."""

from sr.models import (  # noqa: F401
    drcn,
    edsr,
    espcn,
    fsrcnn,
    lapsrn,
    srcnn,
    srgan,
    srresnet,
    vdsr,
)
from sr.models.registry import (  # noqa: F401
    ModelSpec,
    available_models,
    get_spec,
)
