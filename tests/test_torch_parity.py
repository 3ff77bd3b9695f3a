"""Cross-framework topology parity: every Flax model ≡ a PyTorch replica.

The strongest parity evidence this environment can produce (VERDICT r1
item 2): build the reference ``Net`` topologies in PyTorch
(sr/utils/torch_refnets.py), transplant the Flax weights
(sr/utils/torch_interop.py), and assert forward equality. A silent
divergence in padding geometry, PReLU sharing, BN semantics, pixel-shuffle
channel order, or deconv geometry fails these tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from flax.traverse_util import flatten_dict, unflatten_dict

from sr.models.registry import get_spec
from sr.utils.config import SRConfig
from sr.utils.torch_interop import (
    convblock_plan,
    deconvblock_plan,
    transplant,
)

from sr.utils import torch_refnets as tref


def _randomize(variables: dict, seed: int) -> dict:
    """Replace degenerate init values (zero biases, identity BN, constant
    PReLU slopes) with random ones so the transplant of every atom kind is
    actually exercised. Kernels keep their model-specific init (sane
    magnitudes through deep nets)."""
    rng = np.random.default_rng(seed)
    out = {}
    for col, tree in variables.items():
        flat = flatten_dict(tree)
        new = {}
        for k, v in flat.items():
            leaf = k[-1]
            shape = np.shape(v)
            if leaf in ("bias", "mean", "slope"):
                new[k] = jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
            elif leaf == "scale":
                new[k] = jnp.asarray(
                    1.0 + rng.normal(0, 0.1, shape), jnp.float32
                )
            elif leaf == "var":
                new[k] = jnp.asarray(
                    0.5 + np.abs(rng.normal(0, 0.2, shape)), jnp.float32
                )
            elif leaf == "recursion_weights":
                new[k] = jnp.asarray(
                    rng.uniform(0.5, 1.5, shape) / shape[0], jnp.float32
                )
            else:
                new[k] = jnp.asarray(v)
        out[col] = unflatten_dict(new)
    return out


def _flax_forward(model, variables, x_nhwc):
    fn = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    )
    return np.asarray(fn(variables, jnp.asarray(x_nhwc)), np.float32)


def _torch_forward(tnet, x_nhwc):
    tnet.eval()
    with torch.no_grad():
        xt = torch.from_numpy(
            np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2))
        )
        return tnet(xt).numpy().transpose(0, 2, 3, 1)


def _compare(ours, ref, atol=1e-4):
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=1e-4)


def _setup(name, ch, seed, **cfg_kw):
    cfg = SRConfig(
        model_name=name, num_channels=ch, scale_factor=4,
        dtype="float32",  # bit-level parity needs f32 compute
        **cfg_kw,
    )
    spec = get_spec(name)
    model = spec.make_model(cfg)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (2, 12, 12, ch)).astype(np.float32)
    variables = _randomize(
        model.init(jax.random.key(seed), jnp.asarray(x), train=False), seed
    )
    return model, variables, x


def test_srcnn_matches_torch():
    model, v, x = _setup("SRCNN", 1, 0)
    tnet = tref.TorchSRCNN()
    plan = [e for i in range(3) for e in convblock_plan(f"ConvBlock_{i}")]
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_vdsr_matches_torch():
    model, v, x = _setup("VDSR", 1, 1)
    tnet = tref.TorchVDSR()
    plan = [e for i in range(20) for e in convblock_plan(f"ConvBlock_{i}")]
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_drcn_matches_torch():
    model, v, x = _setup("DRCN", 1, 2, num_recursions=4)
    tnet = tref.TorchDRCN(depth=4)
    plan = (
        convblock_plan("ConvBlock_0")
        + convblock_plan("ConvBlock_1")
        # the scanned shared block: inference conv + reconstruction net
        # (params broadcast across recursions; recon lives INSIDE the
        # scan so eval accumulates the ensemble in O(1) memory)
        + [("Scan_RecBlock_0/Conv_0", "conv")]
        + convblock_plan("Scan_RecBlock_0/ConvBlock_0")
        + [("Scan_RecBlock_0/Conv_1", "conv")]
    )
    transplant(v["params"], None, plan, tnet)
    with torch.no_grad():
        tnet.w.copy_(
            torch.from_numpy(np.asarray(v["params"]["recursion_weights"]))
        )
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_espcn_matches_torch():
    model, v, x = _setup("ESPCN", 1, 3)
    tnet = tref.TorchESPCN()
    plan = (
        convblock_plan("ConvBlock_0")
        + convblock_plan("ConvBlock_1")
        + [("Conv_0", "conv")]
    )
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_fsrcnn_matches_torch():
    model, v, x = _setup("FSRCNN", 1, 4)
    tnet = tref.TorchFSRCNN()
    plan = [
        e
        for i in range(7)
        for e in convblock_plan(f"ConvBlock_{i}", act="prelu")
    ] + deconvblock_plan("DeconvBlock_0")
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_edsr_matches_torch():
    model, v, x = _setup("EDSR", 3, 5, num_resblocks=3, res_scale=0.1)
    tnet = tref.TorchEDSR(blocks=3, res_scale=0.1)
    plan = [("head/Conv_0", "conv")]
    for i in range(3):
        plan += [(f"blocks_{i}/Conv_0", "conv"), (f"blocks_{i}/Conv_1", "conv")]
    plan += [("body_conv/Conv_0", "conv")]
    plan += [(f"upsample_{i}/Conv_0", "conv") for i in range(2)]
    plan += [("out_conv/Conv_0", "conv")]
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_srresnet_matches_torch():
    model, v, x = _setup("SRResNet", 3, 6, num_resblocks=2)
    tnet = tref.TorchSRResNet(blocks=2)
    plan = [("head", "conv"), ("head_act", "prelu")]
    for i in range(2):
        p = f"blocks_{i}"
        plan += [
            (f"{p}/Conv_0", "conv"),
            (f"{p}/_NormAct_0/BatchNorm_0", "bn"),
            (f"{p}/_NormAct_0/PReLU_0", "prelu"),
            (f"{p}/Conv_1", "conv"),
            (f"{p}/BatchNorm_0", "bn"),
        ]
    plan += [("body_conv", "conv"), ("body_bn", "bn")]
    for i in range(2):
        plan += convblock_plan(f"upsample_{i}", act="prelu")
    plan += [("out_conv", "conv")]
    transplant(v["params"], v["batch_stats"], plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))


def test_srgan_discriminator_matches_torch():
    cfg = SRConfig(
        model_name="SRGAN", num_channels=3, scale_factor=4, dtype="float32"
    )
    spec = get_spec("SRGAN")
    model = spec.make_discriminator(cfg)
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    v = _randomize(model.init(jax.random.key(7), jnp.asarray(x), train=False), 7)
    tnet = tref.TorchDiscriminator(hr_size=32)
    plan = convblock_plan("ConvBlock_0")
    for i in range(1, 8):
        plan += convblock_plan(f"ConvBlock_{i}", norm="batch")
    plan += [
        ("Dense_0", "dense_nhwc", (2, 2, 512)),
        ("Dense_1", "dense"),
    ]
    transplant(v["params"], v["batch_stats"], plan, tnet)
    ours = np.asarray(
        jax.jit(lambda vv, xx: model.apply(vv, xx, train=False))(
            v, jnp.asarray(x)
        ),
        np.float32,
    )
    tnet.eval()
    with torch.no_grad():
        ref = tnet(
            torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-4)


def test_lapsrn_matches_torch():
    model, v, x = _setup("LapSRN", 1, 8)
    tnet = tref.TorchLapSRN()
    # torch registration order: feat_in, feat_branches[0], feat_branches[1],
    # res_convs[0..1], img_deconvs[0..1] (see TorchLapSRN.__init__)
    plan = convblock_plan("ConvBlock_0")
    for i in range(1, 6):
        plan += convblock_plan(f"ConvBlock_{i}")
    plan += deconvblock_plan("DeconvBlock_0")
    for i in range(7, 12):
        plan += convblock_plan(f"ConvBlock_{i}")
    plan += deconvblock_plan("DeconvBlock_2")
    plan += convblock_plan("ConvBlock_6") + convblock_plan("ConvBlock_12")
    plan += deconvblock_plan("DeconvBlock_1") + deconvblock_plan("DeconvBlock_3")
    transplant(v["params"], None, plan, tnet)
    _compare(_flax_forward(model, v, x), _torch_forward(tnet, x))
