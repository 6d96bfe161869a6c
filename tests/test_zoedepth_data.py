"""ZoeDepth fine-tune data pipeline + depth eval metrics + CLI smoke
(VERDICT r4 item 6 — the last coverage delta).

Reference semantics pinned here:
* ``DataLoadPreprocess`` train transforms (kb-crop, rotation, /255 + depth
  scaling, random crop, flip/photometric aug, strict mask) —
  ``src/zoedepth/data/data_mono.py:292-371``;
* online_eval samples (native res, has_valid_depth, >=/<= then strict mask
  overwrite) — ``data_mono.py:372-429``;
* ``compute_errors``/``compute_metrics`` with eigen/garg crops —
  ``src/zoedepth/utils/misc.py:159-247`` (cross-checked against a direct
  transcription of the reference formulas);
* ``RepetitiveRoundRobinLoader`` length quirk — ``data_mono.py:204-213``;
* the fine-tune CLI runs 5 steps + validation end to end on this layout.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from depthg_tpu.models.zoedepth.data_mono import (DataLoadPreprocess,
                                                  MonoDepthDataConfig,
                                                  RepetitiveRoundRobinLoader,
                                                  batched)
from depthg_tpu.models.zoedepth.metrics import (RunningAverageDict,
                                                compute_errors,
                                                compute_metrics)

def _make_layout(root, n=6, hw=(48, 64), depth_scale=1000.0, seed=0):
    """Tiny nyu-shaped dataset: rgb jpgs? (png keeps exactness), uint16 depth."""
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "rgb")
    gt_dir = os.path.join(root, "gt")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(gt_dir, exist_ok=True)
    lines = []
    for i in range(n):
        img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(img_dir, f"{i}.png"))
        depth = rng.uniform(0.5, 9.0, hw) * depth_scale
        Image.fromarray(depth.astype(np.uint16)).save(
            os.path.join(gt_dir, f"{i}.png"))
        lines.append(f"rgb/{i}.png gt/{i}.png 518.8579")
    fn = os.path.join(root, "files.txt")
    with open(fn, "w") as f:
        f.write("\n".join(lines))
    return fn


def _cfg(root, fn, **over):
    kw = dict(dataset="nyu", data_path=root, gt_path=root,
              data_path_eval=root, gt_path_eval=root,
              filenames_file=fn, filenames_file_eval=fn,
              input_height=32, input_width=48, min_depth=1e-3, max_depth=10.0,
              do_kb_crop=False, do_random_rotate=True, degree=2.5,
              aug=True, random_crop=True)
    kw.update(over)
    return MonoDepthDataConfig(**kw)


def test_train_sample_shapes_and_mask(tmp_path):
    fn = _make_layout(str(tmp_path))
    ds = DataLoadPreprocess(_cfg(str(tmp_path), fn), "train")
    assert len(ds) == 6
    s = ds[0]
    assert s["image"].shape == (3, 32, 48)
    assert s["depth"].shape == (1, 32, 48)
    assert s["mask"].dtype == bool
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    # depth scaled by /1000 for nyu -> metric range
    assert 0.0 < s["depth"][s["mask"]].min() < 10.0
    # mask is the strict open-bound validity (data_mono.py:367-368)
    np.testing.assert_array_equal(
        s["mask"], (s["depth"] > 1e-3) & (s["depth"] < 10.0))


def test_train_sample_deterministic_per_index(tmp_path):
    fn = _make_layout(str(tmp_path))
    ds = DataLoadPreprocess(_cfg(str(tmp_path), fn), "train")
    a, b = ds[1], ds[1]
    np.testing.assert_array_equal(a["image"], b["image"])
    c = ds[2]
    assert not np.array_equal(a["image"], c["image"])


def test_no_aug_is_pure_scaling(tmp_path):
    fn = _make_layout(str(tmp_path))
    cfg = _cfg(str(tmp_path), fn, aug=False, random_crop=False,
               do_random_rotate=False, input_height=48, input_width=64)
    ds = DataLoadPreprocess(cfg, "train")
    s = ds[0]
    raw = np.asarray(Image.open(tmp_path / "rgb" / "0.png"), np.float32) / 255.0
    np.testing.assert_allclose(s["image"], raw.transpose(2, 0, 1))
    raw_d = np.asarray(Image.open(tmp_path / "gt" / "0.png"), np.float32) / 1000.0
    np.testing.assert_allclose(s["depth"][0], raw_d)


def test_kb_crop_shapes(tmp_path):
    fn = _make_layout(str(tmp_path), n=2, hw=(375, 1242), depth_scale=256.0)
    cfg = _cfg(str(tmp_path), fn, dataset="kitti", do_kb_crop=True,
               aug=False, random_crop=False, do_random_rotate=False,
               input_height=352, input_width=1216, max_depth=80.0)
    ds = DataLoadPreprocess(cfg, "train")
    s = ds[0]
    # kb-crop = bottom 352 rows, center 1216 cols (data_mono.py:313-321)
    assert s["image"].shape == (3, 352, 1216)
    ev = DataLoadPreprocess(cfg, "online_eval")[0]
    assert ev["image"].shape == (3, 352, 1216)
    assert ev["has_valid_depth"] and ev["depth"].shape == (1, 352, 1216)


def test_online_eval_missing_depth_tolerated(tmp_path):
    fn = _make_layout(str(tmp_path), n=2)
    # point one line at a missing depth file (data_mono.py:387-393)
    with open(fn) as f:
        lines = f.read().splitlines()
    lines[1] = lines[1].replace("gt/1.png", "gt/nope.png")
    with open(fn, "w") as f:
        f.write("\n".join(lines))
    ds = DataLoadPreprocess(_cfg(str(tmp_path), fn), "online_eval")
    assert ds[0]["has_valid_depth"]
    assert not ds[1]["has_valid_depth"]
    assert "depth" not in ds[1]


def test_batched_stacks(tmp_path):
    fn = _make_layout(str(tmp_path))
    ds = DataLoadPreprocess(_cfg(str(tmp_path), fn), "train")
    batches = list(batched(ds, 3))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (3, 3, 32, 48)
    assert batches[0]["dataset"] == ["nyu"] * 3


def test_roundrobin_interleaves_and_cycles():
    rr = RepetitiveRoundRobinLoader(["A", "B", "C"], ["D"])
    got = []
    for i, x in enumerate(rr):
        got.append(x)
        if i >= 7:
            break
    assert got[:6] == ["A", "D", "B", "D", "C", "D"]
    # reference length quirk: n_loaders * (max_len + 1)
    assert len(rr) == 2 * (3 + 1)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------

def test_compute_errors_reference_formulas():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 9.0, 1000)
    pred = gt * rng.uniform(0.8, 1.25, 1000)
    m = compute_errors(gt, pred)
    thresh = np.maximum(gt / pred, pred / gt)
    np.testing.assert_allclose(m["a1"], (thresh < 1.25).mean())
    np.testing.assert_allclose(m["abs_rel"], np.mean(np.abs(gt - pred) / gt))
    np.testing.assert_allclose(m["rmse"], np.sqrt(np.mean((gt - pred) ** 2)))
    err = np.log(pred) - np.log(gt)
    np.testing.assert_allclose(
        m["silog"], np.sqrt(np.mean(err ** 2) - np.mean(err) ** 2) * 100)
    assert m["a1"] <= m["a2"] <= m["a3"] <= 1.0


def test_compute_metrics_perfect_pred_and_crops():
    rng = np.random.default_rng(1)
    gt = rng.uniform(0.5, 9.0, (480, 640)).astype(np.float32)
    m = compute_metrics(gt, gt.copy(), eigen_crop=True, garg_crop=False)
    assert m["abs_rel"] == 0.0 and m["rmse"] == 0.0 and m["a1"] == 1.0

    # eigen crop must ignore errors outside [45:471, 41:601] (misc.py:237-239)
    pred = gt.copy()
    pred[:40, :] = 5.0
    m2 = compute_metrics(gt, pred, eigen_crop=True, garg_crop=False)
    assert m2["abs_rel"] == 0.0

    # garg crop fractions (misc.py:230-232)
    pred = gt.copy()
    pred[: int(0.40810811 * 480) - 1, :] = 5.0
    m3 = compute_metrics(gt, pred, eigen_crop=False, garg_crop=True)
    assert m3["abs_rel"] == 0.0


def test_compute_metrics_clips_and_interpolates():
    gt = np.full((48, 64), 5.0, np.float32)
    pred = np.full((48, 64), np.inf, np.float32)  # inf -> max_depth_eval
    m = compute_metrics(gt, pred, eigen_crop=False, garg_crop=False,
                        min_depth_eval=0.1, max_depth_eval=10.0)
    np.testing.assert_allclose(m["rmse"], 5.0)  # clipped to 10 vs gt 5

    # low-res prediction: bilinear align_corners=True upsample (misc.py:214-216)
    pred_lo = np.full((24, 32), 20.0, np.float32)  # finite, still clips to 10
    m2 = compute_metrics(gt, pred_lo, eigen_crop=False, garg_crop=False,
                         min_depth_eval=0.1, max_depth_eval=10.0)
    np.testing.assert_allclose(m2["rmse"], 5.0)


def test_running_average_dict():
    r = RunningAverageDict()
    r.update({"x": 1.0})
    r.update(None)  # no-op like the reference
    r.update({"x": 3.0})
    assert r.get_value() == {"x": 2.0}


# ---------------------------------------------------------------------------
# CLI smoke: 5 fine-tune steps + validation on the synthetic layout
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_finetune_cli_smoke(tmp_path):
    fn = _make_layout(str(tmp_path), n=4, hw=(64, 96))
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "scripts/finetune_zoedepth.py",
         f"data_path={tmp_path}", f"gt_path={tmp_path}",
         f"data_path_eval={tmp_path}", f"gt_path_eval={tmp_path}",
         f"filenames_file={fn}", f"filenames_file_eval={fn}",
         "tiny_model=true", "batch_size=2", "epochs=3", "max_steps=5",
         "aug=false", "random_crop=false", "eval_limit=2", "log_every=1",
         f"output_dir={out}"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=900)
    assert r.returncode == 0, r.stderr[-3000:]
    recs = [json.loads(ln) for ln in r.stdout.splitlines()
            if ln.startswith("{")]
    finals = [r_ for r_ in recs if "final" in r_]
    assert finals and "abs_rel" in finals[0]["final"]
    steps = [r_ for r_ in recs if "loss/total" in r_]
    assert len(steps) >= 5 and all(np.isfinite(s["loss/total"]) for s in steps)
    assert (out / "latest").exists()
