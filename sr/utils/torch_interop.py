"""Flax → PyTorch weight transplantation.

Used by the cross-framework topology-parity suite
(tests/test_torch_parity.py) to prove each Flax model computes the SAME
function as a PyTorch replica of the reference net (reference: each model
file's ``Net`` — srcnn.py:Net … lapsrn.py:Net), and usable standalone to
export trained checkpoints to torch for downstream consumers.

Conventions (see sr/nn/blocks.py padding note):

* flax ``nn.Conv`` kernel is HWIO; torch ``Conv2d`` weight is OIHW.
* flax ``nn.ConvTranspose`` kernel is HW-in-out and UNFLIPPED; torch
  ``ConvTranspose2d`` weight is (in, out, kh, kw) and acts as the
  transpose of a cross-correlation — the torch-equivalent weight is the
  spatially FLIPPED flax kernel.
* flax ``nn.Dense`` after an NHWC flatten sees features in H·W·C order;
  torch linears after an NCHW flatten see C·H·W order — ``dense_nhwc``
  entries carry the pre-flatten shape so the rows can be permuted.
* BatchNorm: flax ``scale/bias`` + ``batch_stats {mean, var}`` map to
  torch ``weight/bias/running_mean/running_var`` (same eps=1e-5; flax
  momentum 0.9 ≡ torch momentum 0.1).
"""

from __future__ import annotations

from typing import Any, Iterable, Sequence

import numpy as np

ATOM_TYPES = ("conv", "deconv", "bn", "dense", "dense_nhwc", "prelu")


def get_path(tree: dict, path: str) -> Any:
    """Navigate a nested flax dict by a '/'-separated path."""
    node: Any = tree
    for part in path.split("/"):
        node = node[part]
    return node


def torch_atoms(module) -> list:
    """Parametric torch leaf modules in registration (definition) order."""
    import torch.nn as tnn

    kinds = (
        tnn.Conv2d,
        tnn.ConvTranspose2d,
        tnn.BatchNorm2d,
        tnn.Linear,
        tnn.PReLU,
    )
    return [m for m in module.modules() if isinstance(m, kinds)]


def transplant(
    params: dict,
    batch_stats: dict | None,
    plan: Sequence[tuple],
    torch_model,
) -> None:
    """Copy flax weights into ``torch_model`` in-place.

    ``plan`` is an ordered list of atoms in the torch model's module
    DEFINITION order: ``(flax_path, kind)`` or, for ``dense_nhwc``,
    ``(flax_path, "dense_nhwc", (h, w, c))`` with the pre-flatten NHWC
    spatial shape.
    """
    import torch

    atoms = torch_atoms(torch_model)
    assert len(atoms) == len(plan), (
        f"plan has {len(plan)} atoms, torch model has {len(atoms)}"
    )

    def cp(dst, src: np.ndarray) -> None:
        src = np.array(src, np.float32, copy=True, order="C")
        assert tuple(dst.shape) == src.shape, (tuple(dst.shape), src.shape)
        with torch.no_grad():
            dst.copy_(torch.from_numpy(src))

    for entry, tmod in zip(plan, atoms):
        path, kind = entry[0], entry[1]
        if kind == "conv":
            node = get_path(params, path)
            cp(tmod.weight, np.transpose(node["kernel"], (3, 2, 0, 1)))
            if tmod.bias is not None:
                cp(tmod.bias, node["bias"])
        elif kind == "deconv":
            node = get_path(params, path)
            k = np.asarray(node["kernel"])[::-1, ::-1]  # flip spatial
            cp(tmod.weight, np.transpose(k, (2, 3, 0, 1)))
            if tmod.bias is not None:
                cp(tmod.bias, node["bias"])
        elif kind == "bn":
            node = get_path(params, path)
            cp(tmod.weight, node["scale"])
            cp(tmod.bias, node["bias"])
            assert batch_stats is not None, f"bn atom {path} needs batch_stats"
            stats = get_path(batch_stats, path)
            cp(tmod.running_mean, stats["mean"])
            cp(tmod.running_var, stats["var"])
        elif kind == "dense":
            node = get_path(params, path)
            cp(tmod.weight, np.transpose(node["kernel"]))
            cp(tmod.bias, node["bias"])
        elif kind == "dense_nhwc":
            h, w, c = entry[2]
            node = get_path(params, path)
            kern = np.asarray(node["kernel"])  # (h·w·c, out) in HWC order
            out = kern.shape[1]
            kern = kern.reshape(h, w, c, out).transpose(2, 0, 1, 3)
            cp(tmod.weight, np.transpose(kern.reshape(c * h * w, out)))
            cp(tmod.bias, node["bias"])
        elif kind == "prelu":
            node = get_path(params, path)
            cp(tmod.weight, np.asarray(node["slope"]).reshape(1))
        else:
            raise ValueError(f"unknown atom kind {kind!r}")


def convblock_plan(path: str, act: str | None = None, norm: str | None = None):
    """Atoms of one sr.nn.blocks.ConvBlock in forward order."""
    plan = [(f"{path}/Conv_0", "conv")]
    if norm == "batch":
        plan.append((f"{path}/_NormAct_0/BatchNorm_0", "bn"))
    if act == "prelu":
        plan.append((f"{path}/_NormAct_0/PReLU_0", "prelu"))
    return plan


def deconvblock_plan(path: str, act: str | None = None, norm: str | None = None):
    """Atoms of one sr.nn.blocks.DeconvBlock in forward order."""
    plan = [(f"{path}/ConvTranspose_0", "deconv")]
    if norm == "batch":
        plan.append((f"{path}/_NormAct_0/BatchNorm_0", "bn"))
    if act == "prelu":
        plan.append((f"{path}/_NormAct_0/PReLU_0", "prelu"))
    return plan
