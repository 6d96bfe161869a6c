"""Data layer: transforms semantics, cropped dataset, contrastive pairing, loader."""

import numpy as np
import pytest
from PIL import Image

from depthg_tpu.config import Config
from depthg_tpu.data import (
    ContrastiveSegDataset,
    CroppedDataset,
    DataLoader,
    get_transform,
)
from depthg_tpu.data.transforms import GeometricAug, PhotometricAug, unnormalize

from synthetic_data import make_cropped_dataset, make_nns


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_cropped_dataset(str(root), n=10, size=64)
    make_nns(str(root), "vit_small", "cocostuff27", "train", "five", 32, n=10)
    return str(root)


def test_transform_resize_and_center_crop():
    t = get_transform(32, is_label=False, crop_type="center")
    img = Image.fromarray(np.random.default_rng(0).integers(0, 255, (64, 96, 3), np.uint8))
    out = t(img)
    assert out.shape == (3, 32, 32)
    # image path is float + ImageNet normalized (mean-ish around 0)
    assert abs(float(out.mean())) < 3.0

    tl = get_transform(32, is_label=True, crop_type="center")
    lab = Image.fromarray(np.random.default_rng(0).integers(0, 27, (64, 96), np.uint8))
    out_l = tl(lab)
    assert out_l.shape == (32, 32) and out_l.dtype == np.int64


def test_cropped_dataset_semantics(data_root):
    t = get_transform(32, False, "center")
    tl = get_transform(32, True, "center")
    ds = CroppedDataset(data_root, "cocostuff27", "five", 0.5, "train", t, tl,
                        return_depth=True)
    assert len(ds) == 10
    item = ds.__getitem__(0, np.random.default_rng(0))
    assert item["img"].shape == (3, 32, 32)
    assert item["label"].min() >= -1  # stored +1, shifted back
    assert item["depth"].shape == (1, 32, 32)
    assert item["depth"].max() > 1.5  # label-transform depth keeps 0..255 scale
    assert (item["mask"] == (item["label"] == -1)).all()


def test_contrastive_dataset_full_ret(data_root):
    cfg = Config(model_type="vit_small", res=32, crop_ratio=0.5, crop_type="five")
    ds = ContrastiveSegDataset(
        data_root, "cocostuff27", "five", "train",
        get_transform(32, False, "center"), get_transform(32, True, "center"), cfg,
        aug_geometric_transform=GeometricAug(32),
        aug_photometric_transform=PhotometricAug(),
        num_neighbors=7, mask=True, pos_images=True, pos_labels=True,
        return_depth=True)
    assert ds.n_classes == 27
    item = ds.__getitem__(3, np.random.default_rng(1))
    for key in ("ind", "img", "label", "depth", "img_pos", "ind_pos", "depth_pos",
                "mask", "label_pos", "mask_pos", "img_aug", "coord_aug"):
        assert key in item, key
    assert item["coord_aug"].shape == (32, 32, 2)
    assert item["img_aug"].shape == (3, 32, 32)
    # positive is a real neighbor (rank 1..7) of item 3
    assert item["ind_pos"] in ds.nns[3][1:8]


def test_loader_determinism_and_shapes(data_root):
    cfg = Config(model_type="vit_small", res=32, crop_ratio=0.5, crop_type="five")
    ds = ContrastiveSegDataset(
        data_root, "cocostuff27", "five", "train",
        get_transform(32, False, "center"), get_transform(32, True, "center"), cfg,
        num_neighbors=7, pos_images=True, pos_labels=True, return_depth=True)
    dl1 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2, seed=7)
    dl2 = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1, seed=7)
    b1 = next(iter(dl1))
    b2 = next(iter(dl2))
    assert b1["img"].shape == (4, 3, 32, 32)
    np.testing.assert_array_equal(b1["ind"], b2["ind"])
    np.testing.assert_allclose(b1["img"], b2["img"])  # worker count irrelevant
    np.testing.assert_allclose(b1["depth"], b2["depth"])


def test_coco_fine_to_coarse_table():
    from depthg_tpu.data.datasets import coco_fine_to_coarse
    table = coco_fine_to_coarse()
    assert table.shape == (182,)
    # spot checks against the reference dict (src/data.py:351-367)
    assert table[0] == 9 and table[9] == 8 and table[71] == 0 and table[77] == 1
    assert table[170] == 18 and table[181] == 24 and table[119] == 26
    assert table.min() >= 0 and table.max() == 26


def test_unnormalize_roundtrip():
    from depthg_tpu.data.transforms import normalize_array
    rng = np.random.default_rng(0)
    x = rng.random((3, 8, 8)).astype(np.float32)
    np.testing.assert_allclose(unnormalize(normalize_array(x)), x, atol=1e-6)
