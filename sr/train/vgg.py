"""VGG19 feature extractor for the SRGAN perceptual loss.

The reference wraps a pretrained torchvision ``vgg19.features`` tower
(reference: srgan.py:FeatureExtractor) and compares ImageNet-normalized
features of SR vs HR (reference: utils.py:norm). Rebuilt as a pure Flax
module with:

  * a weight importer for a local torchvision ``vgg19`` state-dict file
    (``torch.load`` on host — this environment has no network, so weights
    must be provided as a file; reference parity needs them);
  * a documented graceful degradation: without weights the GAN trainer
    drops the perceptual term (or, for experiments, a deterministic
    random-init tower can be used as a random-projection prior).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG19 'features' conv plan: (block, convs-in-block, channels)
_PLAN = [(1, 2, 64), (2, 2, 128), (3, 4, 256), (4, 4, 512), (5, 4, 512)]

# ImageNet normalization (reference: utils.py:norm / torchvision)
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def vgg_normalize(x: jax.Array) -> jax.Array:
    """[0,1] RGB NHWC → ImageNet-normalized."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def layer_names() -> list[str]:
    names = []
    for block, convs, _ in _PLAN:
        for c in range(1, convs + 1):
            names.append(f"relu{block}_{c}")
        names.append(f"pool{block}")
    return names


class VGG19Features(nn.Module):
    """VGG19 conv tower up to ``output_layer`` (NHWC, [0,1] RGB input).

    ``output_layer`` ∈ layer_names(), e.g. 'relu2_2' (SRGAN's φ22) or
    'relu5_4' (φ54, the paper's final choice).
    """

    output_layer: str = "relu5_4"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = vgg_normalize(x)
        for block, convs, ch in _PLAN:
            for c in range(1, convs + 1):
                x = nn.Conv(
                    ch, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"conv{block}_{c}",
                )(x)
                x = nn.relu(x)
                if self.output_layer == f"relu{block}_{c}":
                    return x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            if self.output_layer == f"pool{block}":
                return x
        raise ValueError(f"unknown output_layer {self.output_layer!r}")


def import_torchvision_weights(path: str) -> dict:
    """torchvision vgg19 state_dict (.pth) → flax params for VGG19Features.

    torch conv weights are (out, in, kh, kw); flax wants (kh, kw, in, out).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # torchvision indexing: features.<i>.weight where i runs over
    # [conv, relu]*N + pool per block
    idx = 0
    params: dict[str, dict] = {}
    for block, convs, _ in _PLAN:
        for c in range(1, convs + 1):
            w = sd[f"features.{idx}.weight"].numpy().transpose(2, 3, 1, 0)
            b = sd[f"features.{idx}.bias"].numpy()
            params[f"conv{block}_{c}"] = {
                "kernel": jnp.asarray(w), "bias": jnp.asarray(b)
            }
            idx += 2  # conv + relu
        idx += 1  # pool
    return params


def load_vgg(
    weights_path: str | None,
    output_layer: str = "relu5_4",
    rng: jax.Array | None = None,
    dtype: Any = jnp.float32,
) -> tuple[VGG19Features, dict] | tuple[None, None]:
    """Build the tower + params. None path → (None, None) (perceptual
    loss disabled — the documented no-network degradation)."""
    model = VGG19Features(output_layer=output_layer, dtype=dtype)
    if weights_path is None:
        return None, None
    if weights_path == "random":
        # deterministic random tower (random-projection perceptual prior)
        rng = rng if rng is not None else jax.random.key(0)
        variables = model.init(rng, jnp.zeros((1, 64, 64, 3)))
        return model, variables["params"]
    params = import_torchvision_weights(weights_path)
    return model, params
