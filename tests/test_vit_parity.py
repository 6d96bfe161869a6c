"""Golden parity: our JAX ViT vs the reference torch DINO ViT on random weights.

The reference implementation is imported (not copied) from /root/reference for
testing only; skipped when unavailable.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference/src"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference not mounted")

if os.path.isdir(REF):
    sys.path.insert(0, REF)
    import torch
    from dino import vision_transformer as ref_vits

from depthg_tpu.models import vit as jvit
from depthg_tpu.utils.ckpt import vit_params_from_torch, to_jax

HI = "float32"


def _make_pair(img_size, patch_size=8):
    torch.manual_seed(0)
    tmodel = ref_vits.vit_small(patch_size=patch_size, num_classes=0, img_size=[img_size])
    tmodel.eval()
    params = to_jax(vit_params_from_torch(tmodel.state_dict()))
    cfg = jvit.ViTConfig(patch_size=patch_size, embed_dim=384, depth=12,
                         num_heads=6, img_size=img_size)
    return tmodel, params, cfg


@pytest.mark.parametrize("train_size,run_size", [(64, (64, 64)), (64, (96, 96)),
                                                 (64, (64, 96)), (64, (96, 64))])
def test_get_intermediate_feat_parity(train_size, run_size):
    tmodel, params, cfg = _make_pair(train_size)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *run_size)).astype(np.float32)

    with torch.no_grad():
        tf, ta, tq = tmodel.get_intermediate_feat(torch.from_numpy(x), n=1)
    jf, ja, jq = jvit.vit_apply(params, jnp.asarray(x), cfg, n=1, precision=HI)

    np.testing.assert_allclose(np.asarray(jf[0]), tf[0].numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(ja[0]), ta[0].numpy(), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(jq[0]), tq[0].numpy(), atol=2e-4, rtol=2e-4)


def test_featurizer_grid_matches_reference_reshape():
    """Check tokens->grid matches the reference's reshape/permute on the last block."""
    tmodel, params, cfg = _make_pair(64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        tf, _, _ = tmodel.get_intermediate_feat(torch.from_numpy(x), n=1)
    fh = fw = 64 // 8
    want = tf[0][:, 1:, :].reshape(1, fh, fw, -1).permute(0, 3, 1, 2).numpy()

    from depthg_tpu.models.featurizer import FeaturizerConfig, backbone_features
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8)
    feat, attn = backbone_features({"vit": params}, jnp.asarray(x), fcfg, precision=HI)
    np.testing.assert_allclose(np.asarray(feat), want, atol=2e-4, rtol=2e-4)
