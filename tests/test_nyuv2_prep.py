"""NYUv2 prep helpers (reference src/data.py:1144-1277): local processing of
staged archives — unpack, rename, split, 16-bit depth extraction."""

import os
import tarfile
from os.path import join

import numpy as np
import pytest
from PIL import Image

from depthg_tpu.data import nyuv2_prep


def _make_tgz(path, member_names, size=(8, 8)):
    src = path.rstrip(".tgz") + "_src"
    os.makedirs(src, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in member_names:
        Image.fromarray(rng.integers(0, 255, (*size, 3), np.uint8)).save(join(src, n))
    with tarfile.open(path, "w:gz") as tar:
        for n in member_names:
            tar.add(join(src, n), arcname=n)


def test_rgb_and_seg_prep_from_staged_archives(tmp_path):
    root = str(tmp_path)
    # stage archives as a no-egress user would
    _make_tgz(join(root, "nyu_train_rgb.tgz"),
              ["nyu_rgb_0001.png", "nyu_rgb_0002.png"])
    _make_tgz(join(root, "nyu_test_rgb.tgz"), ["nyu_rgb_0003.png"])
    nyuv2_prep.download_rgb(root)
    assert sorted(os.listdir(join(root, "train_rgb"))) == ["0001.png", "0002.png"]
    assert os.listdir(join(root, "test_rgb")) == ["0003.png"]

    _make_tgz(join(root, "nyuv2_train_class13.tgz"),
              ["new_nyu_class13_0001.png", "new_nyu_class13_0002.png"])
    _make_tgz(join(root, "nyuv2_test_class13.tgz"), ["new_nyu_class13_0003.png"])
    nyuv2_prep.download_seg(root)
    assert sorted(os.listdir(join(root, "train_seg13"))) == ["0001.png", "0002.png"]

    # idempotent: a second run leaves the prepared folders alone
    nyuv2_prep.download_rgb(root)
    assert sorted(os.listdir(join(root, "train_rgb"))) == ["0001.png", "0002.png"]


def test_depth_extraction_from_mat(tmp_path):
    h5py = pytest.importorskip("h5py")
    root = str(tmp_path)
    rng = np.random.default_rng(1)
    depths = rng.random((3, 6, 8)).astype(np.float32) * 5  # [N, W, H] like the mat
    with h5py.File(join(root, "nyu_depth_v2_labeled.mat"), "w") as f:
        f.create_dataset("depths", data=depths)

    nyuv2_prep.create_depth_files(join(root, "nyu_depth_v2_labeled.mat"),
                                  root, train_ids=["0001", "0003"])
    assert sorted(os.listdir(join(root, "train_depth"))) == ["0001.png", "0003.png"]
    assert os.listdir(join(root, "test_depth")) == ["0002.png"]
    img = np.asarray(Image.open(join(root, "train_depth", "0001.png")))
    assert img.dtype == np.uint16 and img.shape == (8, 6)  # transposed
    np.testing.assert_array_equal(img, (depths[0] * 1e4).astype(np.uint16).T)


def test_download_fails_fast_with_url(tmp_path):
    with pytest.raises(RuntimeError, match="nyu_train_rgb.tgz|cannot download"):
        nyuv2_prep.download_rgb(str(tmp_path))


def test_figures_render(tmp_path):
    """prediction_grid + confusion_matrix_figure produce readable PNGs."""
    from depthg_tpu.data.datasets import create_pascal_label_colormap
    from depthg_tpu.utils.figures import confusion_matrix_figure, prediction_grid

    rng = np.random.default_rng(0)
    cmap = create_pascal_label_colormap()
    imgs = [rng.integers(0, 255, (32, 32, 3), np.uint8) for _ in range(3)]
    lab = [cmap[rng.integers(0, 27, (32, 32))].astype(np.uint8) for _ in range(3)]
    grid = join(str(tmp_path), "grid.png")
    prediction_grid(imgs, lab, lab, lab, cmap, grid)
    assert Image.open(grid).size[0] > 100

    stats = rng.integers(0, 100, (27, 27))
    cm = join(str(tmp_path), "cm.png")
    confusion_matrix_figure(stats, "cocostuff27", cmap, cm)
    assert Image.open(cm).size == (1000, 1000)
