"""Write a synthetic torchvision-format VGG19 state dict.

No network ⇒ no pretrained VGG19. This generates a .pth with the exact
torchvision ``vgg19().state_dict()`` layout (``features.<i>.weight``
indexing with conv/relu/pool interleaving) and default torch conv init,
so the full import → perceptual-loss path
(sr/train/vgg.py:import_torchvision_weights) runs at training scale.
Random features act as a fixed random-projection prior; swap in the real
``vgg19-dcbb9e9d.pth`` for reference-parity perceptual training.

Usage: python scripts/make_synthetic_vgg.py [out.pth]
"""

from __future__ import annotations

import sys


def make_state_dict():
    import torch

    cfg_plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
    torch.manual_seed(0)
    layers = []
    in_c = 3
    for v in cfg_plan:
        if v == "M":
            layers.append(torch.nn.MaxPool2d(2, 2))
        else:
            layers.append(torch.nn.Conv2d(in_c, v, 3, padding=1))
            layers.append(torch.nn.ReLU(inplace=True))
            in_c = v
    features = torch.nn.Sequential(*layers)
    return {
        f"features.{i}.{k}": v
        for i, layer in enumerate(features)
        for k, v in layer.state_dict().items()
    }


def main() -> None:
    import torch

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vgg19_synthetic.pth"
    torch.save(make_state_dict(), out)
    print(out)


if __name__ == "__main__":
    main()
