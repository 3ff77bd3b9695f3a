"""Result rendering: loss curves + bicubic|SR|GT comparison panels.

The reference's signature artifacts (reference: utils.py:plot_loss,
utils.py:plot_test_result, utils.py:save_img): per-model loss curves and
side-by-side panels with PSNR captions. Matplotlib 'Agg', file outputs.
"""

from __future__ import annotations

import os

import numpy as np


def _ycc_to_rgb_u8(img: np.ndarray) -> np.ndarray:
    from sr.eval.metrics import ycbcr_to_rgb

    rgb = np.asarray(ycbcr_to_rgb(img.astype(np.float32)))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def to_displayable(img: np.ndarray, color_space: str = "ycbcr") -> np.ndarray:
    """uint8 HWC (1 or 3 channels) → RGB/gray uint8 for rendering."""
    if img.shape[-1] == 1:
        return np.repeat(img, 3, axis=-1)
    if color_space == "ycbcr":
        return _ycc_to_rgb_u8(img)
    return img


def save_img(img: np.ndarray, path: str, color_space: str = "ycbcr") -> None:
    """(reference: utils.py:save_img)"""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(to_displayable(img, color_space)).save(path)


def plot_loss(losses: list[float], path: str, title: str = "training loss") -> None:
    """(reference: utils.py:plot_loss)"""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(losses)
    ax.set_xlabel("epoch")
    ax.set_ylabel("loss")
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)


def plot_test_result(
    bicubic: np.ndarray,
    sr: np.ndarray,
    hr: np.ndarray,
    path: str,
    psnr_bicubic: float | None = None,
    psnr_sr: float | None = None,
    color_space: str = "ycbcr",
) -> None:
    """bicubic | SR | ground-truth panel with PSNR captions.

    (reference: utils.py:plot_test_result)
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    imgs = [bicubic, sr, hr]
    titles = [
        "Bicubic" + (f"\n{psnr_bicubic:.2f} dB" if psnr_bicubic is not None else ""),
        "SR" + (f"\n{psnr_sr:.2f} dB" if psnr_sr is not None else ""),
        "Ground truth",
    ]
    fig, axes = plt.subplots(1, 3, figsize=(12, 5))
    for ax, im, t in zip(axes, imgs, titles):
        ax.imshow(to_displayable(im, color_space))
        ax.set_title(t, fontsize=10)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
