"""LHP modules + depth-fused featurizer: parity vs torch transcriptions & shapes."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from depthg_tpu.models.featurizer_depth import (
    DepthFeaturizerConfig,
    conv2x2_init,
    conv2x2_s2,
    depth_featurizer_apply,
    depth_featurizer_init,
    layer_norm_2d,
)
from depthg_tpu.models.lhp import (
    LHPConfig,
    _attn_affinity,
    _depth_affinity,
    lhp_apply,
    lhp_init,
    neighborhood_mask,
)
from depthg_tpu.models.vit import ViTConfig

RNG = np.random.default_rng(9)


def test_depth_affinity_matches_torch_spec():
    depth = RNG.random((2, 1, 32, 32)).astype(np.float32)
    hw = (8, 8)
    got = np.asarray(_depth_affinity(jnp.asarray(depth), hw, original=False))

    # torch transcription of src/modules.py:286-316
    d = F.adaptive_avg_pool2d(torch.from_numpy(depth), hw)
    dists = []
    for i in range(d.shape[0]):
        dm = d[i, 0]
        factor = 2.0 * torch.tan(torch.tensor([90.0]) / 2.0)
        yy, xx = torch.meshgrid(torch.arange(8), torch.arange(8), indexing="ij")
        y = factor * dm * (yy - 4.0) / 8
        x = factor * dm * (xx - 4.0) / 8
        pc = torch.stack([x, y, -dm * 5.0]).view(3, -1).permute(1, 0)
        dists.append(torch.cdist(pc, pc, p=2))
    dist = torch.stack(dists)
    lo = dist.min(dim=2, keepdim=True).values
    hi = dist.max(dim=2, keepdim=True).values
    normed = (dist - lo) / (hi - lo)
    neg = 1 - normed
    thr = torch.quantile(normed, 0.01, dim=2, keepdim=True)
    neg[normed > thr] = 0.0
    np.testing.assert_allclose(got, neg.numpy(), atol=2e-4, rtol=1e-3)


def test_attn_affinity_matches_torch_spec():
    attn = RNG.random((2, 6, 65, 65)).astype(np.float32)
    got = np.asarray(_attn_affinity(jnp.asarray(attn), original=False))
    a = torch.from_numpy(attn)[:, :, 1:, 1:].mean(1)
    a = (a - a.min(dim=2, keepdim=True).values) / (
        a.max(dim=2, keepdim=True).values - a.min(dim=2, keepdim=True).values)
    cap = torch.quantile(a, 0.99, dim=2, keepdim=True)
    a[a > cap] = 0.0
    np.testing.assert_allclose(got, a.numpy(), atol=2e-5, rtol=1e-4)


def test_neighborhood_mask_counts():
    m = neighborhood_mask(4)
    assert m.shape == (16, 16)
    assert m[0].sum() == 4       # corner: self + 3 neighbors
    assert m[1].sum() == 6       # edge
    assert m[5].sum() == 9       # interior
    assert (m == m.T).all()


def test_lhp_apply_shapes_and_fallback():
    cfg = LHPConfig(dim=8, res=32, patch_size=8)
    params = lhp_init(jax.random.PRNGKey(0), cfg)
    code = jnp.asarray(RNG.standard_normal((2, 8, 4, 4)).astype(np.float32))
    depth = jnp.asarray(RNG.random((2, 1, 32, 32)).astype(np.float32))
    attn = jnp.asarray(RNG.random((2, 2, 17, 17)).astype(np.float32))
    out = lhp_apply(params, cfg, code, depth, None, attn)
    assert out.shape == code.shape and bool(jnp.isfinite(out).all())
    # no depth -> plain projection (reference forward early-exit)
    out2 = lhp_apply(params, cfg, code, None, None, None)
    assert out2.shape == code.shape


def test_conv2x2_matches_torch():
    x = RNG.standard_normal((2, 3, 16, 16)).astype(np.float32)
    p = conv2x2_init(jax.random.PRNGKey(0), 3, 7)
    # build equivalent torch conv from the same weights
    w = np.asarray(p["w"]).T.reshape(7, 3, 2, 2)
    conv = torch.nn.Conv2d(3, 7, 2, stride=2)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))
    want = conv(torch.from_numpy(x)).detach().numpy()
    got = np.asarray(conv2x2_s2(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_layer_norm_2d_matches_torch():
    x = RNG.standard_normal((2, 5, 4, 4)).astype(np.float32)
    g = RNG.standard_normal(5).astype(np.float32)
    b = RNG.standard_normal(5).astype(np.float32)
    xt = torch.from_numpy(x)
    u = xt.mean(1, keepdim=True)
    s = (xt - u).pow(2).mean(1, keepdim=True)
    want = (xt - u) / torch.sqrt(s + 1e-6)
    want = torch.from_numpy(g)[:, None, None] * want + torch.from_numpy(b)[:, None, None]
    got = np.asarray(layer_norm_2d({"g": jnp.asarray(g), "b": jnp.asarray(b)}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("guidance", ["none", "sum", "cross_attn"])
def test_depth_featurizer_modes(guidance):
    # embed_dim must be 384 so the 3-stage depth pyramid (8x downscale)
    # matches the patch-8 grid — a reference constraint (see module docstring)
    tiny = ViTConfig(patch_size=8, embed_dim=384, depth=2, num_heads=2, img_size=32)
    fcfg = DepthFeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                                 vit_config=tiny, guidance=guidance,
                                 cross_attn_heads=4)
    params = depth_featurizer_init(jax.random.PRNGKey(0), fcfg)
    img = jnp.asarray(RNG.standard_normal((2, 3, 32, 32)).astype(np.float32))
    depth = jnp.asarray(RNG.random((2, 1, 32, 32)).astype(np.float32))
    out = depth_featurizer_apply(params, img, fcfg, depth,
                                 key=jax.random.PRNGKey(1), train=True)
    assert out["feats"].shape == (2, 384, 4, 4)
    assert out["code"].shape == (2, 16, 4, 4)
    assert "orig_feats" in out
    # eval mode without depth: cross_attn uses the no_depth_embed token
    out_eval = depth_featurizer_apply(params, img, fcfg, None)
    assert out_eval["code"].shape == (2, 16, 4, 4)
    assert "orig_feats" not in out_eval
    assert bool(jnp.isfinite(out_eval["code"]).all())


def test_depth_pyramid_output_resolution():
    fcfg = DepthFeaturizerConfig(arch="vit_small", patch_size=8, dim=16)
    params = depth_featurizer_init(jax.random.PRNGKey(0), fcfg)
    from depthg_tpu.models.featurizer_depth import depth_pyramid
    depth = jnp.asarray(RNG.random((1, 1, 224, 224)).astype(np.float32))
    out = depth_pyramid(params, depth)
    assert out.shape == (1, 384, 28, 28)  # 3 stride-2 stages for n_feats=384


def test_lhp_depth_strategy_propagates_without_attn(monkeypatch):
    """The flash backbone returns attn=None; the "depth" strategy never
    reads attn values, so propagation must still run (the reference's
    trainer always passes a real attn — src/modules.py:190-192 — making
    this strategy-aware guard behaviorally identical). The "attn" strategy
    must instead force the attention-returning backbone path."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from depthg_tpu.models.lhp import LHPConfig, lhp_apply, lhp_init
    from depthg_tpu.models import vit as vit_lib

    cfg = LHPConfig(dim=4, res=16, patch_size=8, propagation_strategy="depth")
    params = lhp_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    code = jnp.asarray(rng.standard_normal((2, 4, 2, 2)).astype(np.float32))
    depth = jnp.asarray(rng.random((2, 1, 16, 16)).astype(np.float32))

    out_no_attn = lhp_apply(params, cfg, code, depth=depth, attn=None)
    out_proj_only = lhp_apply(params, cfg, code)  # reference fallback
    # attn=None must NOT collapse to projection-only for the depth strategy
    assert not np.allclose(np.asarray(out_no_attn), np.asarray(out_proj_only))

    # "attn" strategy with explicit flash must be rejected loudly, never
    # silently degraded
    import pytest

    with pytest.raises(ValueError, match="flash"):
        vit_lib.resolve_attn_impl("flash", need_attn=True, precision=None)
