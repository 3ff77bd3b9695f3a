"""SRGAN trainer tests: two-phase training, D/G updates, VGG tower."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sr.data.datasets import SyntheticDataset
from sr.data.pipeline import PatchPipeline
from sr.train.gan import GANTrainer
from sr.train.vgg import VGG19Features, layer_names, vgg_normalize
from sr.utils.config import SRConfig


@pytest.fixture(scope="module")
def setup():
    cfg = SRConfig(model_name="SRGAN", scale_factor=4, crop_size=32,
                   batch_size=8, num_channels=3, dtype="float32",
                   num_resblocks=2, steps_per_epoch=2, pretrain_epochs=1,
                   vgg_weights_path=None)
    ds = SyntheticDataset(num_images=2, size=(64, 64), channels=3)
    pipe = PatchPipeline([ds[i] for i in range(2)], crop_size=32,
                         scale_factor=4, batch_size=8, channels=3,
                         augment=False, random_scale=False)
    tr = GANTrainer(cfg)
    batch = pipe(jax.random.key(0))

    def fresh_states():
        # steps donate their input states, so every test needs fresh ones
        return tr.init_states(
            jax.random.key(1), batch["lr"][:1], batch["hr"][:1]
        )

    return tr, fresh_states, batch, pipe


def test_pretrain_step_decreases_content_loss(setup):
    tr, fresh, batch, _ = setup
    g, d = fresh()
    first = None
    for i in range(10):
        g, m = tr.pretrain_step(g, batch)
        if i == 0:
            first = float(m["g_content_loss"])
    assert float(m["g_content_loss"]) < first


def test_adversarial_step_updates_both(setup):
    tr, fresh, batch, _ = setup
    g, d = fresh()
    g_before = jax.tree.map(np.asarray, g.params)
    d_before = jax.tree.map(np.asarray, d.params)
    g2, d2, m = tr.adversarial_step(g, d, batch)
    assert {"d_loss", "g_loss", "g_content_loss", "g_adv_loss"} <= set(m)
    changed_g = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(g_before), jax.tree.leaves(g2.params))
    )
    changed_d = any(
        not np.array_equal(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(d_before), jax.tree.leaves(d2.params))
    )
    assert changed_g and changed_d
    assert int(g2.step) == 1 and int(d2.step) == 1


def test_fit_two_phases(setup):
    tr, fresh, batch, pipe = setup
    g, d = fresh()
    logs = []
    g, d = tr.fit(g, d, pipe, num_epochs=2, steps_per_epoch=2,
                  pretrain_epochs=1, log_cb=logs.append)
    phases = {l["phase"] for l in logs}
    assert phases == {"pretrain", "adversarial"}


def test_vgg_tower_shapes():
    m = VGG19Features(output_layer="relu2_2")
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 32, 32, 128)  # one pool before block 2
    m54 = VGG19Features(output_layer="relu5_4")
    v54 = m54.init(jax.random.key(0), x)
    out54 = m54.apply(v54, x)
    assert out54.shape == (1, 4, 4, 512)  # four pools before relu5_4
    assert "relu5_4" in layer_names()


def test_vgg_normalize():
    x = jnp.ones((1, 2, 2, 3)) * 0.5
    out = np.asarray(vgg_normalize(x))
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / np.array(
        [0.229, 0.224, 0.225]
    )
    np.testing.assert_allclose(out[0, 0, 0], expected, rtol=1e-5)


def test_vgg_weight_import_roundtrip(tmp_path):
    """Import a tiny synthetic torchvision-format state dict and check the
    flax tower reproduces torch's forward exactly."""
    import torch

    tv = torch.nn.Sequential()
    # build the torchvision vgg19.features layout
    cfg_plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
                512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]
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
    sd = {f"features.{i}.{k}": v for i, l in enumerate(features)
          for k, v in l.state_dict().items()}
    path = str(tmp_path / "vgg19.pth")
    torch.save(sd, path)

    from sr.train.vgg import import_torchvision_weights

    params = import_torchvision_weights(path)
    x = np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)

    m = VGG19Features(output_layer="relu2_2")
    # bypass normalization for the oracle comparison by denormalizing input
    from sr.train.vgg import IMAGENET_MEAN, IMAGENET_STD

    x_norm = (x - IMAGENET_MEAN) / IMAGENET_STD
    ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        xt = torch.from_numpy(x_norm.transpose(0, 3, 1, 2))
        ref = features[:9](xt).numpy().transpose(0, 2, 3, 1)  # through relu2_2
    np.testing.assert_allclose(ours, ref, atol=1e-4)
