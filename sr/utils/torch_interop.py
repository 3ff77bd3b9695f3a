"""Flax ↔ PyTorch weight transplantation.

Two directions:

* ``transplant`` (flax → torch): used by the cross-framework
  topology-parity suite (tests/test_torch_parity.py) to prove each Flax
  model computes the SAME function as a PyTorch replica of the reference
  net (reference: each model file's ``Net`` — srcnn.py:Net …
  lapsrn.py:Net), and usable standalone to export trained checkpoints to
  torch for downstream consumers.
* ``import_state_dict`` (torch → flax): loads a reference-style
  checkpoint (``torch.save(model.state_dict())`` — reference: each
  wrapper's ``save_model`` → ``<Model>_param.pkl``) into Flax variables,
  so users migrating from the reference keep their trained weights.
  ``reference_plan`` builds the per-model atom plan from the Flax model's
  own topology fields. Plans pair atoms POSITIONALLY with the state_dict's
  registration order (key names are never matched — the reference's
  attribute names are unverifiable while the mount is empty, SURVEY §0);
  if a real reference checkpoint ever disagrees on registration order,
  the fix is a one-line plan reorder.

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


def group_state_dict(state_dict) -> list[tuple[str, dict]]:
    """Group a torch ``state_dict`` into per-module atoms, preserving the
    registration order dicts carry. Returns ``[(prefix, {field: array})]``
    with ``num_batches_tracked`` buffers dropped; a bare ``nn.Parameter``
    (no dot in its key) becomes a single-field group (field ``""``)."""
    groups: dict[str, dict] = {}
    order: list[str] = []
    for k, v in state_dict.items():
        if k.endswith("num_batches_tracked"):
            continue
        prefix, _, field = k.rpartition(".")
        if prefix == "":
            prefix, field = k, ""
        if prefix not in groups:
            groups[prefix] = {}
            order.append(prefix)
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else v
        groups[prefix][field] = np.asarray(arr, np.float32)
    return [(p, groups[p]) for p in order]


def import_state_dict(state_dict, plan: Sequence[tuple],
                      variables: dict) -> dict:
    """Torch ``state_dict`` → new Flax ``variables`` (inverse of
    ``transplant``).

    ``plan``: ordered atoms as for ``transplant`` (build with
    ``reference_plan``); the extra kind ``"tensor"`` maps a bare
    ``nn.Parameter`` (e.g. DRCN's recursion weights) to a params path.
    ``variables``: a freshly-initialized ``{"params": …[, "batch_stats"]}``
    giving the target tree structure; returned unchanged in shape with
    every plan-covered leaf replaced. A conv/deconv atom whose checkpoint
    group has no bias zeroes the Flax bias (torch ``bias=False`` layers).
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    groups = group_state_dict(state_dict)
    if len(groups) != len(plan):
        raise ValueError(
            f"checkpoint has {len(groups)} atoms "
            f"({[p for p, _ in groups[:6]]}…), plan expects {len(plan)}")

    params = dict(flatten_dict(variables["params"]))
    stats = dict(flatten_dict(variables["batch_stats"])) \
        if variables.get("batch_stats") is not None else None

    def put(tree: dict, path: str, leaf: str | None, value: np.ndarray,
            prefix: str) -> None:
        key = tuple(path.split("/")) + ((leaf,) if leaf else ())
        if key not in tree:
            raise KeyError(f"{'/'.join(key)} not in target variables "
                           f"(checkpoint atom {prefix!r})")
        want = np.shape(tree[key])
        if value.size != int(np.prod(want, dtype=np.int64)):
            raise ValueError(f"{'/'.join(key)}: checkpoint shape "
                             f"{value.shape} vs target {want}")
        # np.array, not ascontiguousarray: the latter promotes 0-d
        # leaves (scalar PReLU slopes) to shape (1,)
        tree[key] = np.array(value.reshape(want), np.float32, order="C")

    def maybe_bias(path: str, g: dict, prefix: str) -> None:
        key = tuple(path.split("/")) + ("bias",)
        if "bias" in g:
            put(params, path, "bias", g["bias"], prefix)
        elif key in params:  # torch bias=False: neutralize the flax bias
            params[key] = np.zeros_like(np.asarray(params[key]))

    for entry, (prefix, g) in zip(plan, groups):
        path, kind = entry[0], entry[1]
        if kind == "conv":
            put(params, path, "kernel",
                np.transpose(g["weight"], (2, 3, 1, 0)), prefix)
            maybe_bias(path, g, prefix)
        elif kind == "deconv":
            k = np.transpose(g["weight"], (2, 3, 0, 1))[::-1, ::-1]
            put(params, path, "kernel", k, prefix)
            maybe_bias(path, g, prefix)
        elif kind == "bn":
            put(params, path, "scale", g["weight"], prefix)
            put(params, path, "bias", g["bias"], prefix)
            assert stats is not None, f"bn atom {path} needs batch_stats"
            put(stats, path, "mean", g["running_mean"], prefix)
            put(stats, path, "var", g["running_var"], prefix)
        elif kind == "dense":
            put(params, path, "kernel", np.transpose(g["weight"]), prefix)
            put(params, path, "bias", g["bias"], prefix)
        elif kind == "dense_nhwc":
            h, w, c = entry[2]
            out = g["weight"].shape[0]
            kern = np.transpose(g["weight"]).reshape(c, h, w, out)
            kern = kern.transpose(1, 2, 0, 3).reshape(h * w * c, out)
            put(params, path, "kernel", kern, prefix)
            put(params, path, "bias", g["bias"], prefix)
        elif kind == "prelu":
            put(params, path, "slope", g["weight"], prefix)
        elif kind == "tensor":
            (value,) = g.values()
            put(params, path, None, value, prefix)
        else:
            raise ValueError(f"unknown atom kind {kind!r}")

    out = {"params": unflatten_dict(params)}
    if stats is not None:
        out["batch_stats"] = unflatten_dict(stats)
    return out


def reference_plan(model_name: str, model) -> list[tuple]:
    """Atom plan for a reference ``<Model>_param.pkl`` checkpoint, derived
    from the Flax model's own topology fields (depths/scale read off
    ``model``, so non-default configs plan correctly). Atom order follows
    the reference ``Net`` module registration order as reconstructed in
    sr/utils/torch_refnets.py (SURVEY §2.2); see the module docstring for
    the order caveat."""
    import math

    n = model_name.lower()
    if n == "srcnn":
        return [e for i in range(3) for e in convblock_plan(f"ConvBlock_{i}")]
    if n == "vdsr":
        return [e for i in range(model.num_layers)
                for e in convblock_plan(f"ConvBlock_{i}")]
    if n == "drcn":
        # torch state_dict emits a module's OWN parameters before its
        # children, so the bare recursion-weights Parameter comes first
        return (
            [("recursion_weights", "tensor")]
            + convblock_plan("ConvBlock_0") + convblock_plan("ConvBlock_1")
            + [("Scan_RecBlock_0/Conv_0", "conv")]
            + convblock_plan("Scan_RecBlock_0/ConvBlock_0")
            + [("Scan_RecBlock_0/Conv_1", "conv")]
        )
    if n == "espcn":
        return (convblock_plan("ConvBlock_0") + convblock_plan("ConvBlock_1")
                + [("Conv_0", "conv")])
    if n == "fsrcnn":
        return [e for i in range(model.m + 3)
                for e in convblock_plan(f"ConvBlock_{i}", act="prelu")
                ] + deconvblock_plan("DeconvBlock_0")
    if n == "edsr":
        n_up = {2: 1, 3: 1, 4: 2, 8: 3}[model.scale_factor]
        plan = [("head/Conv_0", "conv")]
        for i in range(model.num_resblocks):
            plan += [(f"blocks_{i}/Conv_0", "conv"),
                     (f"blocks_{i}/Conv_1", "conv")]
        plan += [("body_conv/Conv_0", "conv")]
        plan += [(f"upsample_{i}/Conv_0", "conv") for i in range(n_up)]
        return plan + [("out_conv/Conv_0", "conv")]
    if n in ("srresnet", "srgan"):
        plan = [("head", "conv"), ("head_act", "prelu")]
        for i in range(model.num_resblocks):
            p = f"blocks_{i}"
            plan += [
                (f"{p}/Conv_0", "conv"),
                (f"{p}/_NormAct_0/BatchNorm_0", "bn"),
                (f"{p}/_NormAct_0/PReLU_0", "prelu"),
                (f"{p}/Conv_1", "conv"),
                (f"{p}/BatchNorm_0", "bn"),
            ]
        plan += [("body_conv", "conv"), ("body_bn", "bn")]
        for i in range(int(math.log2(model.scale_factor))):
            plan += convblock_plan(f"upsample_{i}", act="prelu")
        return plan + [("out_conv", "conv")]
    if n == "lapsrn":
        levels = int(math.log2(model.scale_factor))
        d = model.num_convs
        # flax call-order numbering (sr/models/lapsrn.py): feat_in=CB_0;
        # level L: branch convs CB_{L(d+1)+1..+d} + branch deconv DB_{2L},
        # res conv CB_{L(d+1)+d+1}, img deconv DB_{2L+1}. Torch
        # registration: feat_in, all branches, all res convs, all deconvs.
        plan = convblock_plan("ConvBlock_0")
        for lv in range(levels):
            base = lv * (d + 1)
            for j in range(1, d + 1):
                plan += convblock_plan(f"ConvBlock_{base + j}")
            plan += deconvblock_plan(f"DeconvBlock_{2 * lv}")
        for lv in range(levels):
            plan += convblock_plan(f"ConvBlock_{lv * (d + 1) + d + 1}")
        for lv in range(levels):
            plan += deconvblock_plan(f"DeconvBlock_{2 * lv + 1}")
        return plan
    raise ValueError(f"no reference plan for model {model_name!r}")


def discriminator_plan(hr_size: int, base_filter: int = 64) -> list[tuple]:
    """Atom plan for the SRGAN discriminator (reference:
    srgan.py:Discriminator) at a given training HR crop size."""
    plan = convblock_plan("ConvBlock_0")
    for i in range(1, 8):
        plan += convblock_plan(f"ConvBlock_{i}", norm="batch")
    sp = hr_size // 16
    return plan + [("Dense_0", "dense_nhwc", (sp, sp, base_filter * 8)),
                   ("Dense_1", "dense")]


def load_reference_checkpoint(model_name: str, model, variables: dict,
                              path: str) -> dict:
    """Load a reference-style ``torch.save(state_dict)`` checkpoint
    (``<Model>_param.pkl`` — reference: each wrapper's save_model) into
    Flax variables. Returns new variables; see ``import_state_dict``."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return import_state_dict(state_dict, reference_plan(model_name, model),
                             variables)


def make_reference_net(model_name: str, model):
    """Instantiate the PyTorch replica (sr/utils/torch_refnets.py) whose
    topology matches the given Flax model — the target for
    ``export_reference_checkpoint`` and the oracle for the parity suite."""
    from sr.utils import torch_refnets as tref

    n = model_name.lower()
    c, f = model.num_channels, getattr(model, "base_filter", 64)
    if n == "srcnn":
        return tref.TorchSRCNN(c, f)
    if n == "vdsr":
        return tref.TorchVDSR(c, f, layers=model.num_layers)
    if n == "drcn":
        return tref.TorchDRCN(c, f, depth=model.num_recursions)
    if n == "espcn":
        return tref.TorchESPCN(c, f, r=model.scale_factor)
    if n == "fsrcnn":
        return tref.TorchFSRCNN(c, d=model.d, s=model.s, m=model.m,
                                r=model.scale_factor)
    if n == "edsr":
        return tref.TorchEDSR(c, f, blocks=model.num_resblocks,
                              r=model.scale_factor,
                              res_scale=model.res_scale)
    if n in ("srresnet", "srgan"):
        return tref.TorchSRResNet(c, f, blocks=model.num_resblocks,
                                  r=model.scale_factor)
    if n == "lapsrn":
        return tref.TorchLapSRN(c, f, d=model.num_convs,
                                r=model.scale_factor)
    raise ValueError(f"no torch replica for model {model_name!r}")


def export_reference_checkpoint(model_name: str, model, variables: dict,
                                path: str) -> str:
    """Write trained Flax weights as a reference-style
    ``torch.save(state_dict)`` checkpoint (``<Model>_param.pkl``), so
    models trained here load in the reference collection (the inverse
    migration of ``load_reference_checkpoint``). Returns ``path``."""
    import torch

    tnet = make_reference_net(model_name, model)
    plan = reference_plan(model_name, model)
    params = variables["params"]
    if model_name.lower() == "drcn":  # bare Parameter: plan[0]
        with torch.no_grad():
            tnet.w.copy_(torch.from_numpy(np.array(
                params["recursion_weights"], np.float32)))
        plan = plan[1:]
    transplant(params, variables.get("batch_stats"), plan, tnet)
    torch.save(tnet.state_dict(), path)
    return path


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
