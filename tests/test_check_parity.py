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


@pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                    reason="reference not mounted")
def test_harness_synthetic_artifacts(tiny_zoe, tmp_path):
    """One command, synthetic weights on disk: every enabled check PASSes."""
    import torch

    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.utils.ckpt import export_lightning_ckpt, vit_state_dict

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

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "check_parity", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "scripts", "check_parity.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rc = mod.main([f"ckpt={ckpt}", f"dino={dino}", f"zoe={zoe}",
                   "res=64", "zoe_res=64", "atol=1e-3"])
    statuses = dict(mod.RESULTS)
    assert rc == 0, statuses
    assert statuses["1.demo"] == "PASS"
    assert statuses["2.eval"] == "SKIP"  # no dataset on disk
    assert statuses["3.knn"] == "PASS"
    assert statuses["4.depth"] == "PASS"
    assert statuses["5.train"] == "PASS"
