from sr.nn.blocks import (  # noqa: F401
    ConvBlock,
    DeconvBlock,
    ResnetBlock,
    PSBlock,
    Upsample2xBlock,
    PReLU,
    activation,
)
