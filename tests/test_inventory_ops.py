"""Inventory-completeness ops: joint FPS, knn_for_coords, small utils, cherry
metrics, zoedepth get_config."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(11)


def test_fps_depth_feats_matches_reference_transcription():
    from depthg_tpu.ops.depth import fps_depth_feats_indices

    pts = RNG.standard_normal((64, 3)).astype(np.float64)
    fts = RNG.standard_normal((64, 8)).astype(np.float64)

    # literal numpy transcription of src/modules.py:1124-1180
    p = len(pts)
    left = np.arange(p)
    inds = np.zeros(16, int)
    dists = np.full(p, np.inf)
    left = np.delete(left, 0)
    for i in range(1, 16):
        last = inds[i - 1]
        dp = ((pts[last] - pts[left]) ** 2).sum(-1)
        df = ((fts[last] - fts[left]) ** 2).sum(-1)
        dp = dp / dp.max()
        df = df / df.max()
        d = dp + df
        dists[left] = np.minimum(d, dists[left])
        sel = np.argmax(dists[left])
        inds[i] = left[sel]
        left = np.delete(left, sel)

    got = np.asarray(fps_depth_feats_indices(jnp.asarray(pts.astype(np.float32)),
                                             jnp.asarray(fts.astype(np.float32)), 16))
    # normalization max is over remaining points in the reference vs all
    # unchosen here; require large overlap rather than exact order
    assert len(set(got.tolist()) & set(inds.tolist())) >= 13


def test_knn_for_coords_shapes_and_anchor_passthrough():
    from depthg_tpu.ops.depth import knn_for_coords

    feats = jnp.asarray(RNG.standard_normal((2, 6, 8, 8)).astype(np.float32))
    coords = jnp.asarray(RNG.random((2, 2, 2, 2)).astype(np.float32) * 0.9)
    out = knn_for_coords(feats, coords, samples_per_coord=3)
    assert out.shape == (2, 4 + 4 * 4, 2)  # anchors + (k+1) nns per anchor
    np.testing.assert_allclose(np.asarray(out[:, :4]), np.asarray(coords.reshape(2, 4, 2)))


def test_small_utils_match_torch():
    from depthg_tpu.ops.correlation import average_norm, one_hot_feats

    t = RNG.standard_normal((2, 5, 3, 3)).astype(np.float32)
    want = torch.from_numpy(t) / torch.from_numpy(t).square().sum(1, keepdim=True).sqrt().mean()
    np.testing.assert_allclose(np.asarray(average_norm(jnp.asarray(t))), want.numpy(),
                               atol=1e-5, rtol=1e-5)

    labels = RNG.integers(0, 4, (2, 3, 3))
    want_oh = F.one_hot(torch.from_numpy(labels), 4).permute(0, 3, 1, 2).float()
    np.testing.assert_array_equal(np.asarray(one_hot_feats(jnp.asarray(labels), 4)),
                                  want_oh.numpy())


def test_cherry_metrics_reset_after_compute():
    from depthg_tpu.utils.metrics import SegMetrics

    m = SegMetrics("", 3, 0, True)
    t = np.array([0, 1, 2, 0])
    p = np.array([0, 1, 2, 1])
    m.update_cherry(p, t)
    out1 = m.compute_cherry()
    assert out1["Accuracy"] == pytest.approx(75.0)
    out2 = m.compute_cherry()  # buffer reset -> empty stats
    assert np.isnan(out2["Accuracy"]) or out2["Accuracy"] == 0.0


def test_confusion_heatmap_png(tmp_path):
    from depthg_tpu.utils.metrics import confusion_heatmap_png

    hist = RNG.integers(0, 100, (5, 5))
    path = confusion_heatmap_png(hist, str(tmp_path / "cm.png"))
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (60, 60, 3)


def test_zoedepth_get_config():
    from depthg_tpu.models.zoedepth.config import get_config
    from depthg_tpu.models.zoedepth.model import ZoeConfig
    from depthg_tpu.models.zoedepth.nk import ZoeNKConfig

    cfg = get_config("zoedepth", "infer")
    assert isinstance(cfg, ZoeConfig)
    assert cfg.attractor_type == "inv" and cfg.n_bins == 64

    cfg2 = get_config("zoedepth", "infer", n_bins=32, img_size=256)
    assert cfg2.n_bins == 32 and cfg2.img_size == (256, 256)

    nk = get_config("zoedepth_nk", "infer")
    assert isinstance(nk, ZoeNKConfig)
    assert nk.bin_confs[1].max_depth == 80.0

    with pytest.raises(ValueError):
        get_config("bad_model")
