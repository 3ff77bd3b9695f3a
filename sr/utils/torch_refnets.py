"""PyTorch replicas of the nine reference net topologies.

Oracles for tests/test_torch_parity.py: each class reproduces the
reference's ``Net`` (reference: srcnn.py:Net, vdsr.py:Net, drcn.py:Net,
espcn.py:Net, fsrcnn.py:Net, srgan.py:{Net, Discriminator}, edsr.py:Net,
lapsrn.py:Net — per SURVEY.md §2.2) in the PyTorch idiom: NCHW,
``Conv2d(padding=k//2)``, exact-×stride ``ConvTranspose2d``,
``PixelShuffle``. Modules are DEFINED in forward order — the transplant
plans in test_torch_parity.py pair with them positionally.

One documented delta vs the reference: the discriminator returns LOGITS
(the reference applies sigmoid in the module; sr folds it into the loss —
see sr/models/srresnet.py docstring and PARITY.md).
"""

from __future__ import annotations

import torch
import torch.nn as nn


def conv(i, o, k, s=1, bias=True):
    return nn.Conv2d(i, o, k, stride=s, padding=k // 2, bias=bias)


def deconv(i, o, k, s):
    p = -(-(k - s) // 2)
    return nn.ConvTranspose2d(
        i, o, k, stride=s, padding=p, output_padding=2 * p - (k - s)
    )


class TorchSRCNN(nn.Module):
    def __init__(self, c=1, f=64):
        super().__init__()
        self.net = nn.Sequential(
            conv(c, f, 9), nn.ReLU(),
            conv(f, f // 2, 5), nn.ReLU(),
            conv(f // 2, c, 5),
        )

    def forward(self, x):
        return self.net(x)


class TorchVDSR(nn.Module):
    def __init__(self, c=1, f=64, layers=20):
        super().__init__()
        mods = [conv(c, f, 3, bias=False), nn.ReLU()]
        for _ in range(layers - 2):
            mods += [conv(f, f, 3, bias=False), nn.ReLU()]
        mods += [conv(f, c, 3, bias=False)]
        self.net = nn.Sequential(*mods)

    def forward(self, x):
        return x + self.net(x)


class TorchDRCN(nn.Module):
    def __init__(self, c=1, f=64, depth=16):
        super().__init__()
        self.depth = depth
        self.embed = nn.Sequential(conv(c, f, 3), nn.ReLU(),
                                   conv(f, f, 3), nn.ReLU())
        self.rec = conv(f, f, 3)
        self.recon1 = nn.Sequential(conv(f, f, 3), nn.ReLU())
        self.recon2 = conv(f, c, 3)
        self.w = nn.Parameter(torch.full((depth,), 1.0 / depth))

    def forward(self, x):
        h = self.embed(x)
        ys = []
        for _ in range(self.depth):
            h = torch.relu(self.rec(h))
            ys.append(self.recon2(self.recon1(h)) + x)
        ys = torch.stack(ys, dim=0)  # (D, B, C, H, W)
        w = self.w / self.w.sum()
        return torch.einsum("d,dbchw->bchw", w, ys)


class TorchESPCN(nn.Module):
    def __init__(self, c=1, f=64, r=4):
        super().__init__()
        self.net = nn.Sequential(
            conv(c, f, 5), nn.ReLU(),
            conv(f, f // 2, 3), nn.ReLU(),
            conv(f // 2, c * r * r, 3),
            nn.PixelShuffle(r),
        )

    def forward(self, x):
        return self.net(x)


class TorchFSRCNN(nn.Module):
    def __init__(self, c=1, d=56, s=12, m=4, r=4):
        super().__init__()
        mods = [conv(c, d, 5), nn.PReLU(), conv(d, s, 1), nn.PReLU()]
        for _ in range(m):
            mods += [conv(s, s, 3), nn.PReLU()]
        mods += [conv(s, d, 1), nn.PReLU(), deconv(d, c, 9, r)]
        self.net = nn.Sequential(*mods)

    def forward(self, x):
        return self.net(x)


class _TorchEDSRBlock(nn.Module):
    def __init__(self, f, res_scale):
        super().__init__()
        self.c1 = conv(f, f, 3)
        self.c2 = conv(f, f, 3)
        self.res_scale = res_scale

    def forward(self, x):
        return x + self.res_scale * self.c2(torch.relu(self.c1(x)))


class TorchEDSR(nn.Module):
    def __init__(self, c=3, f=64, blocks=16, r=4, res_scale=1.0):
        super().__init__()
        self.head = conv(c, f, 3)
        self.blocks = nn.ModuleList(
            [_TorchEDSRBlock(f, res_scale) for _ in range(blocks)]
        )
        self.body_conv = conv(f, f, 3)
        stages = {2: (2,), 3: (3,), 4: (2, 2), 8: (2, 2, 2)}[r]
        ups = []
        for s in stages:
            ups += [conv(f, f * s * s, 3), nn.PixelShuffle(s)]
        self.upsample = nn.Sequential(*ups)
        self.out_conv = conv(f, c, 3)

    def forward(self, x):
        x = self.head(x)
        skip = x
        for blk in self.blocks:
            x = blk(x)
        x = self.body_conv(x) + skip
        return self.out_conv(self.upsample(x))


class _TorchSRResBlock(nn.Module):
    def __init__(self, f):
        super().__init__()
        self.c1 = conv(f, f, 3)
        self.bn1 = nn.BatchNorm2d(f)
        self.act = nn.PReLU()
        self.c2 = conv(f, f, 3)
        self.bn2 = nn.BatchNorm2d(f)

    def forward(self, x):
        return x + self.bn2(self.c2(self.act(self.bn1(self.c1(x)))))


class TorchSRResNet(nn.Module):
    def __init__(self, c=3, f=64, blocks=16, r=4):
        super().__init__()
        self.head = conv(c, f, 9)
        self.head_act = nn.PReLU()
        self.blocks = nn.ModuleList([_TorchSRResBlock(f) for _ in range(blocks)])
        self.body_conv = conv(f, f, 3)
        self.body_bn = nn.BatchNorm2d(f)
        ups = []
        for _ in range(r.bit_length() - 1):
            ups += [conv(f, f * 4, 3), nn.PixelShuffle(2), nn.PReLU()]
        self.upsample = nn.Sequential(*ups)
        self.out_conv = conv(f, c, 9)

    def forward(self, x):
        x = self.head_act(self.head(x))
        skip = x
        for blk in self.blocks:
            x = blk(x)
        x = self.body_bn(self.body_conv(x)) + skip
        return self.out_conv(self.upsample(x))


class TorchDiscriminator(nn.Module):
    """VGG-style tower → dense(1024) → LeakyReLU → dense(1) LOGITS."""

    def __init__(self, c=3, f=64, dense=1024, hr_size=32):
        super().__init__()
        tower = [
            (c, f, 1, False), (f, f, 2, True),
            (f, f * 2, 1, True), (f * 2, f * 2, 2, True),
            (f * 2, f * 4, 1, True), (f * 4, f * 4, 2, True),
            (f * 4, f * 8, 1, True), (f * 8, f * 8, 2, True),
        ]
        mods = []
        for ci, co, s, bn in tower:
            mods.append(conv(ci, co, 3, s))
            if bn:
                mods.append(nn.BatchNorm2d(co))
            mods.append(nn.LeakyReLU(0.2))
        self.tower = nn.Sequential(*mods)
        sp = hr_size // 16
        self.fc1 = nn.Linear(f * 8 * sp * sp, dense)
        self.fc2 = nn.Linear(dense, 1)

    def forward(self, x):
        x = self.tower(x)
        x = x.flatten(1)  # NCHW flatten — the reference idiom
        return self.fc2(torch.nn.functional.leaky_relu(self.fc1(x), 0.2))


class TorchLapSRN(nn.Module):
    def __init__(self, c=1, f=64, d=5, r=4):
        super().__init__()
        self.levels = r.bit_length() - 1
        self.feat_in = nn.Sequential(conv(c, f, 3), nn.LeakyReLU(0.2))
        feat_branches, res_convs, img_deconvs = [], [], []
        for _ in range(self.levels):
            mods = []
            for _ in range(d):
                mods += [conv(f, f, 3), nn.LeakyReLU(0.2)]
            mods += [deconv(f, f, 4, 2), nn.LeakyReLU(0.2)]
            feat_branches.append(nn.Sequential(*mods))
            res_convs.append(conv(f, c, 3))
            img_deconvs.append(deconv(c, c, 4, 2))
        self.feat_branches = nn.ModuleList(feat_branches)
        self.res_convs = nn.ModuleList(res_convs)
        self.img_deconvs = nn.ModuleList(img_deconvs)

    def forward(self, x):
        feat = self.feat_in(x)
        img = x
        for lvl in range(self.levels):
            feat = self.feat_branches[lvl](feat)
            residual = self.res_convs[lvl](feat)
            img = self.img_deconvs[lvl](img) + residual
        return img
