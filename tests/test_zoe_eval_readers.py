"""Specialized depth eval-dataset readers vs their reference behaviors
(``src/zoedepth/data/*.py``): folder layouts, filename rewrites, depth
scalings, masks and crops, on synthetic layouts."""

import os

import numpy as np
import pytest
from PIL import Image

from depthg_tpu.models.zoedepth.eval_datasets import (DDAD, DIMLIndoor,
                                                      Diode, EVAL_READERS,
                                                      HyperSim, Ibims,
                                                      SunRGBD, VKitti2,
                                                      get_eval_reader)


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_diml_indoor_layout_scale_resize(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    depth_mm = rng.integers(500, 9000, (96, 128)).astype(np.uint16)
    _png(str(tmp_path / "LR" / "s1" / "color" / "a_c.png"), img)
    _png(str(tmp_path / "LR" / "s1" / "depth_filled" / "a_depth_filled.png"),
         depth_mm)
    ds = DIMLIndoor(str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    assert s["image"].shape == (3, 480, 640)  # resized (diml_indoor_test.py:39)
    np.testing.assert_allclose(s["depth"][0], depth_mm / 1000.0)  # mm -> m
    assert s["dataset"] == "diml_indoor"


def test_ibims_masks_and_scale(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
    depth_u16 = rng.integers(1000, 60000, (24, 32)).astype(np.uint16)
    invalid = (rng.random((24, 32)) > 0.2).astype(np.uint8)
    transp = (rng.random((24, 32)) > 0.1).astype(np.uint8)
    _png(str(tmp_path / "rgb" / "x.png"), img)
    _png(str(tmp_path / "depth" / "x.png"), depth_u16)
    _png(str(tmp_path / "mask_invalid" / "x.png"), invalid)
    _png(str(tmp_path / "mask_transp" / "x.png"), transp)
    (tmp_path / "imagelist.txt").write_text("x\n")
    s = Ibims(str(tmp_path))[0]
    want = np.where(invalid * transp,
                    depth_u16.astype(np.float64) * 50.0 / 65535, -1)
    np.testing.assert_allclose(s["depth"][0], want.astype(np.float32),
                               rtol=1e-6)


def test_sunrgbd_rename_and_scale(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    depth = rng.integers(100, 8000, (20, 30)).astype(np.uint16)
    _png(str(tmp_path / "rgb" / "rgb" / "im1.jpg"), img)
    _png(str(tmp_path / "gt" / "gt" / "im1.png"), depth)
    s = SunRGBD(str(tmp_path))[0]
    np.testing.assert_allclose(s["depth"][0], depth / 1000.0)


def test_diode_npy_and_min_side_resize(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (60, 90, 3), dtype=np.uint8)
    depth = rng.uniform(0.5, 20, (60, 90, 1)).astype(np.float32)
    valid = (rng.random((60, 90)) > 0.3).astype(np.float32)
    base = tmp_path / "scene_1" / "scan_1"
    _png(str(base / "f.png"), img)
    np.save(str(base / "f_depth.npy"), depth)
    np.save(str(base / "f_depth_mask.npy"), valid)
    s = Diode(str(tmp_path))[0]
    # Resize(480): SHORTER side 60 -> 480, aspect kept (diode.py:39)
    assert s["image"].shape == (3, 480, 720)
    assert s["depth"].shape == (1, 60, 90)  # depth untouched
    np.testing.assert_array_equal(s["valid"], valid)


def test_hypersim_distance_to_depth_geometry():
    # planar depth of a constant-distance sphere is max at center, smaller
    # toward corners; the center ray has depth ~= distance
    dist = np.full((768, 1024), 5.0, np.float32)
    depth = HyperSim.distance_to_depth(dist)
    assert depth.shape == (768, 1024)
    c = depth[384, 512]
    np.testing.assert_allclose(c, 5.0, rtol=1e-3)
    assert depth[0, 0] < c  # corner rays are longer per unit depth


def test_vkitti2_split_kbcrop_scale_sentinel(tmp_path):
    rng = np.random.default_rng(4)
    # two scenes x 4 frames at KITTI-like resolution
    for scene in ("Scene01", "Scene02"):
        for i in range(4):
            img = rng.integers(0, 255, (375, 1242, 3), dtype=np.uint8)
            d_cm = rng.integers(100, 7000, (375, 1242)).astype(np.uint16)
            d_cm[0, 0] = 60000  # 600 m -> beyond-80 sentinel after crop? row 0 is cropped
            d_cm[374, 621] = 60000  # inside the kb crop -> -1
            _png(str(tmp_path / "rgb" / scene / "clone" / "frames" / "rgb"
                     / "Camera_0" / f"rgb_{i:05d}.jpg"), img)
            _png(str(tmp_path / "depth" / scene / "clone" / "frames" / "depth"
                     / "Camera_0" / f"depth_{i:05d}.png"), d_cm)
    ds = VKitti2(str(tmp_path), split="test")
    # reference quirk kept: the scene key is basename(dirname^3(path)) =
    # "frames" for EVERY file (vkitti2.py:99-101), so the "per-scene" 92/8
    # split is actually global — 8 files -> int(8*0.92)=7 train, 1 test
    assert len(ds) == 1
    assert os.path.exists(tmp_path / "train.txt")
    with open(tmp_path / "train.txt") as f:
        assert len(f.read().splitlines()) == 7
    s = ds[0]
    assert s["image"].shape == (3, 352, 1216)  # kb crop (vkitti2.py:141-151)
    d = s["depth"][0]
    assert d.shape == (352, 1216)
    # cm -> m and the beyond-80m sentinel
    assert d.max() <= 80.0 or (d == -1).any()
    assert (d == -1).any()


def test_ddad_resize_and_npy(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (100, 160, 3), dtype=np.uint8)
    depth = rng.uniform(1, 70, (100, 160)).astype(np.float32)
    _png(str(tmp_path / "0001_rgb.png"), img)
    np.save(str(tmp_path / "0001_depth.npy"), depth)
    s = DDAD(str(tmp_path))[0]
    assert s["image"].shape == (3, 352, 1216)  # get_ddad_loader resize_shape
    assert s["depth"].shape == (1, 100, 160)


@pytest.mark.slow
def test_validate_over_reader_end_to_end(tmp_path):
    """finetune CLI's validation loop over a specialized reader: masks are
    derived from the dataset spec's open bounds, metrics come back finite."""
    import jax

    from depthg_tpu.models.zoedepth.beit import BEiTConfig
    from depthg_tpu.models.zoedepth.config import DEPTH_DATASETS
    from depthg_tpu.models.zoedepth.data_mono import MonoDepthDataConfig
    from depthg_tpu.models.zoedepth.dpt import DPTConfig
    from depthg_tpu.models.zoedepth.model import ZoeConfig, zoedepth_init

    sys_path = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    import sys
    sys.path.insert(0, os.path.join(sys_path, "scripts"))
    import finetune_zoedepth as cli

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    depth = rng.integers(500, 8000, (64, 96)).astype(np.uint16)
    _png(str(tmp_path / "rgb" / "rgb" / "a.jpg"), img)
    _png(str(tmp_path / "gt" / "gt" / "a.png"), depth)
    reader = SunRGBD(str(tmp_path))

    zcfg = ZoeConfig(
        n_bins=4, bin_embedding_dim=8, n_attractors=(2, 2, 1, 1),
        img_size=(64, 96),
        beit=BEiTConfig(embed_dim=64, depth=4, num_heads=4,
                        pretrain_window=4, hooks=(0, 1, 2, 3)),
        dpt=DPTConfig(embed_dim=64, features=16,
                      reassemble_channels=(8, 16, 32, 32)))
    params = zoedepth_init(jax.random.PRNGKey(0), zcfg)
    dcfg = MonoDepthDataConfig(dataset="sunrgbd")
    spec = DEPTH_DATASETS["sunrgbd"]
    metrics, losses = cli.validate(params, zcfg, dcfg, reader, spec)
    assert "abs_rel" in metrics and np.isfinite(metrics["abs_rel"])
    assert np.isfinite(losses["silog"])


def test_registry_covers_all_eval_datasets():
    from depthg_tpu.models.zoedepth.config import ALL_EVAL_DATASETS

    # every non-train eval dataset of the reference's DATASETS_CONFIG is
    # reachable (kitti/nyu eval goes through DataLoadPreprocess instead,
    # data_mono.py:135-174)
    for name in ALL_EVAL_DATASETS:
        if name in ("kitti", "nyu"):
            continue
        assert name in EVAL_READERS, name
    with pytest.raises(KeyError):
        get_eval_reader("nope", "/tmp")
