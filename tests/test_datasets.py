"""L0 data acquisition: download/extract/layout conventions (VERDICT r4 #7).

The reference's data.py downloads BSDS300 on first use and resolves
named datasets by directory convention (reference: data.py:download_bsds300,
get_training_set, get_test_set). No network exists here, so the download
path is exercised against a locally synthesized BSDS300-shaped tarball
(urlretrieve monkeypatched to a file copy) and the folder conventions
against tmp_path trees — the code paths a datasets-available deployment
would run.
"""

import os
import shutil
import tarfile

import numpy as np
import pytest

from sr.data import datasets as ds_mod
from sr.data.datasets import (FolderDataset, download_bsds300,
                              get_test_set, get_training_set)


def _write_img(path, size=(24, 16), seed=0, mode="RGB"):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (*size, 3), np.uint8)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr, "RGB").convert(mode).save(path)
    return arr


def _make_bsds_tarball(tmp_path, n_train=3, n_test=2):
    """A BSDS300-shaped .tgz: BSDS300/images/{train,test}/*.jpg."""
    src = tmp_path / "tarsrc"
    for i in range(n_train):
        _write_img(str(src / "BSDS300" / "images" / "train" / f"{i}.jpg"),
                   seed=i)
    for i in range(n_test):
        _write_img(str(src / "BSDS300" / "images" / "test" / f"t{i}.jpg"),
                   seed=100 + i)
    tgz = tmp_path / "BSDS300-images.tgz"
    with tarfile.open(tgz, "w:gz") as tar:
        tar.add(src / "BSDS300", arcname="BSDS300")
    return str(tgz)


@pytest.fixture()
def fake_bsds(tmp_path, monkeypatch):
    """data_dir where 'downloading' BSDS300 copies the local tarball."""
    tgz = _make_bsds_tarball(tmp_path)
    calls = []

    def fake_urlretrieve(url, filename):
        calls.append(url)
        shutil.copy(tgz, filename)

    monkeypatch.setattr(ds_mod.urllib.request, "urlretrieve",
                        fake_urlretrieve)
    data_dir = tmp_path / "data"
    return str(data_dir), calls


def test_download_bsds300_extracts_layout(fake_bsds):
    data_dir, calls = fake_bsds
    out = download_bsds300(data_dir)
    assert out == os.path.join(data_dir, "BSDS300", "images")
    assert sorted(os.listdir(os.path.join(out, "train"))) == [
        "0.jpg", "1.jpg", "2.jpg"]
    assert sorted(os.listdir(os.path.join(out, "test"))) == [
        "t0.jpg", "t1.jpg"]
    # the archive is removed after extraction (reference behavior)
    assert not os.path.exists(
        os.path.join(data_dir, "BSDS300-images.tgz"))
    assert calls == [ds_mod.BSDS300_URL]
    # second call short-circuits on the existing image dir — no re-download
    assert download_bsds300(data_dir) == out
    assert len(calls) == 1


def test_download_bsds300_no_network_message(tmp_path, monkeypatch):
    def fail(url, filename):
        raise OSError("no route to host")

    monkeypatch.setattr(ds_mod.urllib.request, "urlretrieve", fail)
    with pytest.raises(RuntimeError, match="synthetic"):
        download_bsds300(str(tmp_path / "nowhere"))


def test_get_training_set_bsds300_convention(fake_bsds):
    data_dir, _ = fake_bsds
    train = get_training_set(data_dir, "bsds300")
    assert len(train) == 3
    assert train.names == ["0", "1", "2"]
    img = train[0]
    assert img.dtype == np.uint8 and img.shape == (24, 16, 3)


def test_get_training_set_concatenates_named_dirs(tmp_path):
    for i in range(2):
        _write_img(str(tmp_path / "train" / "setA" / f"a{i}.png"), seed=i)
    _write_img(str(tmp_path / "train" / "setB" / "b0.png"), seed=9)
    train = get_training_set(str(tmp_path), ["setA", "setB"])
    assert len(train) == 3
    assert train.names == ["a0", "a1", "b0"]


def test_get_training_set_synthetic_not_concatenatable(tmp_path):
    with pytest.raises(ValueError, match="standalone"):
        get_training_set(str(tmp_path), ["synthetic", "setA"])


def test_get_test_set_conventions(fake_bsds):
    data_dir, _ = fake_bsds
    # bsds300 -> images/test
    test = get_test_set(data_dir, "bsds300")
    assert len(test) == 2 and test.names == ["t0", "t1"]
    # named set -> data_dir/test/<name> (Set5/Set14/BSD100/Urban100 shape)
    for i in range(5):
        _write_img(os.path.join(data_dir, "test", "Set5", f"img{i}.bmp"),
                   seed=i)
    set5 = get_test_set(data_dir, "Set5")
    assert len(set5) == 5
    assert set5[2].shape == (24, 16, 3)


def test_folder_dataset_color_spaces(tmp_path):
    p = str(tmp_path / "train" / "c" / "x.png")
    rgb_arr = _write_img(p, seed=3)
    ycbcr = FolderDataset([p], "ycbcr")[0]
    rgb = FolderDataset([p], "rgb")[0]
    assert ycbcr.shape == rgb.shape == (24, 16, 3)
    np.testing.assert_array_equal(rgb, rgb_arr)  # PNG round-trips RGB
    # YCbCr really is the PIL conversion, not a passthrough
    from PIL import Image

    expect = np.asarray(Image.fromarray(rgb_arr, "RGB").convert("YCbCr"))
    np.testing.assert_array_equal(ycbcr, expect)
    # 'y' takes the luma plane only
    y = FolderDataset([p], "y")[0]
    assert y.shape == (24, 16, 1)
    np.testing.assert_array_equal(y[..., 0], expect[..., 0])
    # decode cache: same object back on repeat access
    fd = FolderDataset([p], "rgb")
    assert fd[0] is fd[0]


def test_folder_dataset_gray_source_loads(tmp_path):
    """Grayscale files (BSD100-style) decode through the YCbCr path."""
    p = str(tmp_path / "train" / "g" / "g.png")
    _write_img(p, seed=4, mode="L")
    arr = FolderDataset([p], "ycbcr")[0]
    assert arr.shape == (24, 16, 3)
    # gray source: Cb/Cr are the 128 constant
    assert int(arr[..., 1].min()) == int(arr[..., 1].max()) == 128


def test_get_training_set_empty_raises(tmp_path):
    os.makedirs(tmp_path / "train" / "empty")
    with pytest.raises(RuntimeError, match="no training images"):
        get_training_set(str(tmp_path), "empty")
