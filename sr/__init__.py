"""sr — TPU-native single-image super-resolution framework.

A ground-up JAX/Flax/XLA/Pallas rebuild of the capabilities of
``togheppi/pytorch-super-resolution-model-collection`` (see SURVEY.md):
the SRCNN/FSRCNN/ESPCN/VDSR/DRCN/EDSR/SRResNet/SRGAN/LapSRN model zoo,
an on-device image pipeline, one shared data-parallel trainer, and an
eval harness reproducing the reference's Y-channel / border-shaved PSNR
conventions.

Design principles (TPU-first, not a torch translation):
  * NHWC layout everywhere; bfloat16 compute with float32 params.
  * Pure-functional training steps under ``jax.jit`` / ``shard_map``;
    scale-out via ``jax.sharding.Mesh`` + XLA collectives, not NCCL.
  * Bicubic degradation is a pair of static gather-matmuls (MXU-friendly)
    that bit-match Pillow's fixed-point resampler on the exact path.
  * Hot ops (pixel-shuffle tail, small-channel conv+act) have fused
    Pallas kernels with ``jax.lax`` fallbacks.
"""

__version__ = "0.1.0"
