"""check_parity harness + converter key-layout variants (VERDICT r1 item 3)."""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from synthetic_data import zoe_torch_state_dict

from depthg_tpu.models.zoedepth.beit import BEiTConfig
from depthg_tpu.models.zoedepth.convert import zoe_config_from_params, zoe_params_from_torch
from depthg_tpu.models.zoedepth.dpt import DPTConfig
from depthg_tpu.models.zoedepth.model import ZoeConfig, zoedepth_forward, zoedepth_init

TINY = ZoeConfig(
    n_bins=8, bin_embedding_dim=16,
    n_attractors=(4, 3, 2, 1),
    img_size=(64, 96),
    beit=BEiTConfig(embed_dim=64, depth=8, num_heads=4, pretrain_window=4,
                    hooks=(1, 3, 5, 7)),
    dpt=DPTConfig(embed_dim=64, features=32, reassemble_channels=(16, 32, 64, 64)),
)


@pytest.fixture(scope="module")
def tiny_zoe():
    return jax.device_get(zoedepth_init(jax.random.PRNGKey(2), TINY))


def _forward_equal(a_params, b_params):
    x = jnp.asarray(np.random.default_rng(3).random((1, 3, 64, 64)).astype(np.float32))
    a = zoedepth_forward(jax.device_put(a_params), (x - 0.5) * 2, TINY)["metric_depth"]
    b = zoedepth_forward(jax.device_put(b_params), (x - 0.5) * 2, TINY)["metric_depth"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_converter_module_prefix_variant(tiny_zoe):
    """DataParallel 'module.' prefix (model_io.py:40-44) + {'model': ...} wrap."""
    sd = zoe_torch_state_dict(tiny_zoe, TINY, module_prefix=True)
    restored = zoe_params_from_torch({"model": sd})
    _forward_equal(tiny_zoe, restored)


def test_converter_plain_variant(tiny_zoe):
    sd = zoe_torch_state_dict(tiny_zoe, TINY)
    restored = zoe_params_from_torch(sd)
    _forward_equal(tiny_zoe, restored)


def test_config_derived_from_checkpoint(tiny_zoe):
    """zoe_config_from_params recovers every shape-bearing field."""
    sd = zoe_torch_state_dict(tiny_zoe, TINY)
    cfg = zoe_config_from_params(zoe_params_from_torch(sd))
    assert cfg.n_bins == TINY.n_bins
    assert cfg.bin_embedding_dim == TINY.bin_embedding_dim
    assert cfg.n_attractors == TINY.n_attractors
    assert cfg.beit.embed_dim == TINY.beit.embed_dim
    assert cfg.beit.depth == TINY.beit.depth
    assert cfg.beit.num_heads == TINY.beit.num_heads
    assert cfg.beit.pretrain_window == TINY.beit.pretrain_window
    assert cfg.beit.hooks == TINY.beit.hooks
    assert cfg.dpt.features == TINY.dpt.features
    assert cfg.dpt.reassemble_channels == TINY.dpt.reassemble_channels


def _load_harness():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "check_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def artifacts(tiny_zoe, tmp_path_factory):
    """Synthetic on-disk artifacts in the release layouts: Lightning ckpt,
    DINO .pth, ZoeDepth .pt."""
    import torch

    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.utils.ckpt import export_lightning_ckpt, vit_state_dict

    tmp_path = tmp_path_factory.mktemp("parity_artifacts")
    # DepthG Lightning ckpt (real vit_small shapes so the reference loads it)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=24, dropout=False)
    key = jax.random.PRNGKey(0)
    params = {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(jax.random.PRNGKey(1), 24, 6),
        "cluster_probe": cluster_lookup_init(jax.random.PRNGKey(2), 24, 6),
    }
    ckpt = str(tmp_path / "depthg.ckpt")
    export_lightning_ckpt(ckpt, params, cfg={
        "model_type": "vit_small", "dino_patch_size": 8, "dim": 24,
        "dino_feat_type": "feat", "projection_type": "nonlinear",
        "dropout": False, "n_classes": 6, "extra_clusters": 0,
    }, n_classes=6)

    # DINO .pth with the hub layout
    dino = str(tmp_path / "dino.pth")
    torch.save(vit_state_dict(jax.device_get(params["net"]["vit"])), dino)

    # ZoeDepth .pt in the release layout ({'model': module.-prefixed})
    zoe = str(tmp_path / "zoe.pt")
    torch.save({"model": zoe_torch_state_dict(tiny_zoe, TINY, module_prefix=True)},
               zoe)
    return {"ckpt": ckpt, "dino": dino, "zoe": zoe, "params": params}


pytestmark_ref = pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                                    reason="reference not mounted")


@pytestmark_ref
@pytest.mark.slow
def test_harness_synthetic_artifacts(artifacts):
    """One command, synthetic weights on disk: every enabled check PASSes."""
    mod = _load_harness()
    rc = mod.main([f"ckpt={artifacts['ckpt']}", f"dino={artifacts['dino']}",
                   f"zoe={artifacts['zoe']}", "res=64", "zoe_res=64", "atol=1e-3"])
    statuses = {n: s for n, s, _ in mod.RESULTS}
    assert rc == 0, statuses
    assert statuses["1.demo"] == "PASS"
    assert statuses["2.eval"] == "SKIP"  # no dataset on disk
    assert statuses["3.knn"] == "PASS"
    assert statuses["4.depth"] == "PASS"
    assert statuses["5.train"] == "PASS"


@pytestmark_ref
@pytest.mark.slow
def test_fault_injection_flips_checks(artifacts):
    """Falsifiability: with noise injected into OUR side of every comparison,
    each comparison-based check FAILs (none is vacuous)."""
    mod = _load_harness()
    rc = mod.main([f"ckpt={artifacts['ckpt']}", f"dino={artifacts['dino']}",
                   f"zoe={artifacts['zoe']}", "res=64", "zoe_res=64",
                   "atol=1e-3", "fault=0.05"])
    statuses = {n: s for n, s, _ in mod.RESULTS}
    assert rc == 1, statuses
    assert statuses["1.demo"] == "FAIL"
    assert statuses["3.knn"] == "FAIL"
    assert statuses["4.depth"] == "FAIL"


@pytestmark_ref
@pytest.mark.slow
def test_train_check_fails_on_nan_ckpt(artifacts, tmp_path):
    """5.train flips to FAIL when the checkpoint carries NaN weights."""
    import torch

    blob = torch.load(artifacts["ckpt"], map_location="cpu", weights_only=False)
    key = next(k for k in blob["state_dict"] if "cluster1" in k and "weight" in k)
    blob["state_dict"][key] = blob["state_dict"][key] * float("nan")
    bad = str(tmp_path / "nan.ckpt")
    torch.save(blob, bad)

    mod = _load_harness()
    cfg = mod.Config(ckpt=bad)
    mod.check_train(cfg)
    statuses = {n: s for n, s, _ in mod.RESULTS}
    assert statuses["5.train"] == "FAIL"


@pytestmark_ref
def test_demo_threshold_characterization(artifacts):
    """The 0.999 argmax-agreement bar (check_parity docstring table): measure
    agreement under controlled log-space perturbations of our probe outputs.
    fault=0 must PASS; fault=5e-2 must FAIL with agreement clearly below bar."""
    import re

    mod = _load_harness()
    rows = {}
    for fault in (0.0, 1e-2, 5e-2):
        mod.RESULTS.clear()
        cfg = mod.Config(ckpt=artifacts["ckpt"], res=64, atol=1e-3, fault=fault)
        mod.check_demo(cfg)
        name, status, detail = mod.RESULTS[-1]
        m = re.search(r"agree lin ([0-9.]+) clu ([0-9.]+)", detail)
        rows[fault] = (status, float(m.group(1)), float(m.group(2)))
    assert rows[0.0][0] == "PASS" and rows[0.0][1] == 1.0 and rows[0.0][2] == 1.0
    assert rows[5e-2][0] == "FAIL"
    # agreement degrades monotonically with the fault scale
    assert rows[5e-2][1] <= rows[1e-2][1] <= rows[0.0][1]


def _make_eval_dataset(root, n=4, size=96, seed=0):
    """Minimal cocostuff-shaped val split (images/annotations/curated lists)."""
    from os.path import join

    from PIL import Image

    rng = np.random.default_rng(seed)
    base = join(root, "cocostuff")
    names = [f"val{i}" for i in range(n)]
    os.makedirs(join(base, "curated", "val2017"), exist_ok=True)
    os.makedirs(join(base, "images", "val2017"), exist_ok=True)
    os.makedirs(join(base, "annotations", "val2017"), exist_ok=True)
    for lst in ("Coco164kFull_Stuff_Coarse.txt", "Coco164kFull_Stuff_Coarse_7.txt"):
        with open(join(base, "curated", "val2017", lst), "w") as f:
            f.write("\n".join(names))
    for nme in names:
        Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)).save(
            join(base, "images", "val2017", nme + ".jpg"))
        Image.fromarray(rng.integers(0, 182, (size, size)).astype(np.uint8)).save(
            join(base, "annotations", "val2017", nme + ".png"))


@pytestmark_ref
@pytest.mark.slow
def test_eval_check_expected_metrics(tmp_path):
    """2.eval is falsifiable: NEED without expectations, PASS when the
    expectation matches the measured mIoU, FAIL when it doesn't."""
    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.utils.ckpt import export_lightning_ckpt

    fcfg = FeaturizerConfig(arch="vit_tiny", patch_size=8, dim=16, dropout=False)
    params = {
        "net": featurizer_init(jax.random.PRNGKey(0), fcfg),
        "linear_probe": linear_probe_init(jax.random.PRNGKey(1), 16, 27),
        "cluster_probe": cluster_lookup_init(jax.random.PRNGKey(2), 16, 27),
    }
    ckpt = str(tmp_path / "eval.ckpt")
    export_lightning_ckpt(ckpt, params, cfg={
        "model_type": "vit_tiny", "dino_patch_size": 8, "dim": 16,
        "dino_feat_type": "feat", "projection_type": "nonlinear",
        "dropout": False, "n_classes": 27, "extra_clusters": 0,
        "dataset_name": "cocostuff27",
    }, n_classes=27)
    data_dir = str(tmp_path / "data")
    _make_eval_dataset(data_dir)

    mod = _load_harness()
    base = dict(ckpt=ckpt, data_dir=data_dir, res=32, batch_size=2,
                num_workers=0, output_root=str(tmp_path / "results"))

    mod.RESULTS.clear()
    mod.check_eval(mod.Config(**base))
    name, status, detail = mod.RESULTS[-1]
    assert status == "NEED", (status, detail)
    import re

    measured = float(re.search(r"'final/cluster/mIoU': ([0-9.]+)", detail).group(1))

    mod.RESULTS.clear()
    mod.check_eval(mod.Config(**base, expected_cluster_miou=measured))
    assert mod.RESULTS[-1][1] == "PASS", mod.RESULTS[-1]

    mod.RESULTS.clear()
    mod.check_eval(mod.Config(**base, expected_cluster_miou=measured + 50.0))
    assert mod.RESULTS[-1][1] == "FAIL", mod.RESULTS[-1]
