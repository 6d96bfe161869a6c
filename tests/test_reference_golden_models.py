"""Golden tests vs the actual reference DinoFeaturizer and LHP modules."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(not os.path.isdir("/root/reference/src"),
                                reason="reference not mounted")

if os.path.isdir("/root/reference/src"):
    import torch

    from reference_import import load_reference_modules

    ref_modules, ref_utils = load_reference_modules()

from depthg_tpu.config import Config
from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_apply
from depthg_tpu.models.lhp import LHPConfig, lhp_apply
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.utils.ckpt import _conv1x1, to_jax, vit_params_from_torch


def test_dino_featurizer_golden(tmp_path):
    """Full reference DinoFeaturizer (random weights via a fake 'teacher'
    checkpoint) vs our featurizer with converted weights, eval mode."""
    import dino.vision_transformer as ref_vits

    torch.manual_seed(0)
    backbone = ref_vits.vit_small(patch_size=8, num_classes=0)  # default 224 pos table
    ckpt_path = str(tmp_path / "teacher.pth")
    torch.save({"teacher": backbone.state_dict()}, ckpt_path)

    cfg = Config(dino_patch_size=8, dino_feat_type="feat", model_type="vit_small",
                 pretrained_weights=ckpt_path, projection_type="nonlinear",
                 dropout=False)
    tmod = ref_modules.DinoFeaturizer(16, cfg)
    tmod.eval()

    sd = tmod.state_dict()
    params = to_jax({
        "vit": vit_params_from_torch(
            {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}),
        "cluster1": _conv1x1(sd, "cluster1.0"),
        "cluster2": {"fc1": _conv1x1(sd, "cluster2.0"),
                     "fc2": _conv1x1(sd, "cluster2.2")},
    })
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, dropout=False,
                            vit_config=ViTConfig(patch_size=8, img_size=224))

    x = np.random.default_rng(0).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want_feats, want_code = tmod(torch.from_numpy(x))
    out = featurizer_apply(params, jnp.asarray(x), fcfg, precision="float32")
    np.testing.assert_allclose(np.asarray(out["feats"]), want_feats.numpy(),
                               atol=3e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out["code"]), want_code.numpy(),
                               atol=3e-4, rtol=1e-3)


def _patch_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self,
                        raising=False)


def test_lhp_depth_golden(monkeypatch):
    _patch_cuda(monkeypatch)
    cfg = Config(dim=8, res=32, dino_patch_size=8, propagation_strategy="depth")
    tmod = ref_modules.LocalHiddenPositiveProjection(cfg)
    tmod.eval()

    jp = {"proj": {
        "fc1": {"w": tmod.projection_head[0].weight.detach().numpy()[:, :, 0, 0].T,
                "b": tmod.projection_head[0].bias.detach().numpy()},
        "fc2": {"w": tmod.projection_head[2].weight.detach().numpy()[:, :, 0, 0].T,
                "b": tmod.projection_head[2].bias.detach().numpy()},
    }}
    jcfg = LHPConfig(dim=8, res=32, patch_size=8, propagation_strategy="depth")

    rng = np.random.default_rng(7)
    code = rng.standard_normal((2, 8, 4, 4)).astype(np.float32)
    depth = rng.random((2, 1, 32, 32)).astype(np.float32)
    attn = rng.random((2, 2, 17, 17)).astype(np.float32)

    with torch.no_grad():
        want = tmod(torch.from_numpy(code), torch.from_numpy(depth), None,
                    torch.from_numpy(attn))
    got = lhp_apply(to_jax(jp), jcfg, jnp.asarray(code), jnp.asarray(depth),
                    None, jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4, rtol=1e-3)

    # no-depth fallback: projection only
    with torch.no_grad():
        want2 = tmod(torch.from_numpy(code), None)
    got2 = lhp_apply(to_jax(jp), jcfg, jnp.asarray(code))
    np.testing.assert_allclose(np.asarray(got2), want2.numpy(), atol=1e-5, rtol=1e-4)


def test_lhp_attn_golden(monkeypatch):
    _patch_cuda(monkeypatch)
    cfg = Config(dim=8, res=32, dino_patch_size=8, propagation_strategy="attn")
    tmod = ref_modules.LocalHiddenPositiveProjection(cfg)
    tmod.eval()
    jp = {"proj": {
        "fc1": {"w": tmod.projection_head[0].weight.detach().numpy()[:, :, 0, 0].T,
                "b": tmod.projection_head[0].bias.detach().numpy()},
        "fc2": {"w": tmod.projection_head[2].weight.detach().numpy()[:, :, 0, 0].T,
                "b": tmod.projection_head[2].bias.detach().numpy()},
    }}
    jcfg = LHPConfig(dim=8, res=32, patch_size=8, propagation_strategy="attn")
    rng = np.random.default_rng(8)
    code = rng.standard_normal((2, 8, 4, 4)).astype(np.float32)
    depth = rng.random((2, 1, 32, 32)).astype(np.float32)
    attn = rng.random((2, 2, 17, 17)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(code), torch.from_numpy(depth), None,
                    torch.from_numpy(attn))
    got = lhp_apply(to_jax(jp), jcfg, jnp.asarray(code), jnp.asarray(depth),
                    None, jnp.asarray(attn))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-4, rtol=1e-3)
