"""Lightning checkpoint EXPORT: the reference's own modules must load and
reproduce our outputs (SURVEY.md §7 step 7 torch-compatible export)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_apply, featurizer_init
from depthg_tpu.models.probes import cluster_lookup_apply, cluster_lookup_init, linear_probe_init
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.utils import ckpt as ckpt_lib

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                                reason="reference not mounted")


def _params(fcfg, n_classes=6):
    key = jax.random.PRNGKey(0)
    return {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(jax.random.PRNGKey(1), fcfg.dim, n_classes),
        "cluster_probe": cluster_lookup_init(jax.random.PRNGKey(2), fcfg.dim, n_classes),
    }


def test_export_roundtrip_through_own_loader(tmp_path):
    """export -> load_lightning_ckpt is the identity on params + hparams."""
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=12, dropout=False,
                            vit_config=ViTConfig(patch_size=8, embed_dim=32,
                                                 depth=2, num_heads=2, img_size=32))
    params = _params(fcfg)
    path = str(tmp_path / "export.ckpt")
    cfg = {"model_type": "vit_small", "dino_patch_size": 8, "dim": 12}
    ckpt_lib.export_lightning_ckpt(path, params, cfg, n_classes=6, global_step=7)

    loaded, hparams = ckpt_lib.load_lightning_ckpt(path)
    assert hparams["dim"] == 12 and hparams["model_type"] == "vit_small"
    flat_a = jax.tree_util.tree_leaves_with_path(ckpt_lib.jax_to_numpy(params))
    flat_b = dict(jax.tree_util.tree_leaves_with_path(loaded))
    for path_a, leaf_a in flat_a:
        np.testing.assert_allclose(leaf_a, flat_b[tuple(path_a)], atol=0,
                                   err_msg=str(path_a))


def test_reference_modules_load_export(tmp_path):
    """The reference DinoFeaturizer + ClusterLookup, fed our exported
    state_dict through torch load_state_dict (strict), must reproduce our
    forward outputs — proving the reference's eval_segmentation.py:88 code
    path can consume checkpoints trained here."""
    import torch

    from reference_import import load_reference_modules

    ref_modules, _ = load_reference_modules()
    from depthg_tpu.config import Config

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, dropout=False,
                            vit_config=ViTConfig(patch_size=8, img_size=224))
    params = _params(fcfg, n_classes=5)
    path = str(tmp_path / "export.ckpt")
    ckpt_lib.export_lightning_ckpt(path, params, {"dim": 16}, n_classes=5)

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob["state_dict"]
    assert blob["hyper_parameters"]["n_classes"] == 5

    # reference featurizer: construct with a synthetic teacher ckpt (offline),
    # then overwrite with OUR exported weights, strict on the net.* subset
    torch.manual_seed(0)
    import dino.vision_transformer as ref_vits

    teacher = str(tmp_path / "teacher.pth")
    torch.save({"teacher": ref_vits.vit_small(patch_size=8, num_classes=0).state_dict()},
               teacher)
    cfg = Config(dino_patch_size=8, dino_feat_type="feat", model_type="vit_small",
                 pretrained_weights=teacher, projection_type="nonlinear",
                 dropout=False)
    tmod = ref_modules.DinoFeaturizer(16, cfg)
    net_sd = {k[len("net."):]: v for k, v in sd.items() if k.startswith("net.")}
    missing, unexpected = tmod.load_state_dict(net_sd, strict=True), None
    tmod.eval()

    probe = ref_modules.ClusterLookup(16, 5)
    probe.load_state_dict({"clusters": sd["cluster_probe.clusters"]})

    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_feats, want_code = tmod(torch.from_numpy(x))
        _, want_probs = probe(want_code, None)

    out = featurizer_apply(params["net"], jnp.asarray(x), fcfg, precision="float32")
    np.testing.assert_allclose(np.asarray(out["code"]), want_code.numpy(),
                               atol=5e-4, rtol=1e-3)
    _, got_probs = cluster_lookup_apply(params["cluster_probe"],
                                        out["code"], None)
    np.testing.assert_allclose(np.asarray(got_probs), want_probs.numpy(),
                               atol=5e-4, rtol=1e-3)
