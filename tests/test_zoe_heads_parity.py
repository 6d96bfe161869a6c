"""Golden parity: ZoeDepth head layers vs the vendored reference torch modules.

The reference's layers (attractors, bin regressors, conditional log-binomial)
are pure torch and importable without network access — unlike the MiDaS core.
Weights are shared, so outputs must match to float tolerance.
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
    from zoedepth.models.layers.attractor import AttractorLayer, AttractorLayerUnnormed
    from zoedepth.models.layers.dist_layers import ConditionalLogBinomial
    from zoedepth.models.layers.localbins_layers import (
        Projector,
        SeedBinRegressor,
        SeedBinRegressorUnnormed,
    )

from depthg_tpu.models.zoedepth import heads

RNG = np.random.default_rng(21)


def _copy_mlp2(tmods, jparams):
    """Copy our conv params into a torch Sequential of 1x1 convs."""
    convs = [m for m in tmods if isinstance(m, torch.nn.Conv2d)]
    for conv, p in zip(convs, jparams):
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(np.asarray(p["w"])))
            conv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))


def test_seed_bin_regressor_softplus_parity():
    x = RNG.standard_normal((2, 32, 6, 6)).astype(np.float32)
    jp = heads.mlp2_init(jax.random.PRNGKey(0), 32, 256, 16)
    tmod = SeedBinRegressorUnnormed(32, n_bins=16)
    _copy_mlp2(tmod._net, jp)
    with torch.no_grad():
        want_n, want_c = tmod(torch.from_numpy(x))
    got_n, got_c = heads.seed_bin_regressor_softplus(jp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=1e-5, rtol=1e-4)


def test_seed_bin_regressor_normed_parity():
    x = RNG.standard_normal((2, 32, 6, 6)).astype(np.float32)
    jp = heads.mlp2_init(jax.random.PRNGKey(1), 32, 256, 16)
    tmod = SeedBinRegressor(32, n_bins=16, min_depth=1e-3, max_depth=10.0)
    _copy_mlp2(tmod._net, jp)
    with torch.no_grad():
        want_n, want_c = tmod(torch.from_numpy(x))
    got_n, got_c = heads.seed_bin_regressor_normed(jp, jnp.asarray(x), 1e-3, 10.0)
    np.testing.assert_allclose(np.asarray(got_n), want_n.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=1e-5, rtol=1e-4)


def test_projector_parity():
    x = RNG.standard_normal((2, 32, 6, 6)).astype(np.float32)
    jp = heads.mlp2_init(jax.random.PRNGKey(2), 32, 128, 64)
    tmod = Projector(32, 64)
    _copy_mlp2(tmod._net, jp)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x))
    got = heads.projector(jp, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("attractor_type,kind", [("inv", "mean"), ("exp", "sum")])
def test_attractor_softplus_parity(attractor_type, kind):
    emb_dim, n_bins, n_attr = 16, 8, 4
    x = RNG.standard_normal((2, emb_dim, 6, 6)).astype(np.float32)
    b_prev = RNG.random((2, n_bins, 3, 3)).astype(np.float32) * 5
    prev_emb = RNG.standard_normal((2, emb_dim, 3, 3)).astype(np.float32)
    jp = heads.mlp2_init(jax.random.PRNGKey(3), emb_dim, 128, n_attr)
    tmod = AttractorLayerUnnormed(emb_dim, n_bins, n_attractors=n_attr,
                                  alpha=1000, gamma=2, kind=kind,
                                  attractor_type=attractor_type)
    _copy_mlp2(tmod._net, jp)
    with torch.no_grad():
        want_b, want_c = tmod(torch.from_numpy(x), torch.from_numpy(b_prev),
                              torch.from_numpy(prev_emb), interpolate=True)
    got_b, got_c = heads.attractor_softplus(
        jp, jnp.asarray(x), jnp.asarray(b_prev), jnp.asarray(prev_emb),
        alpha=1000, gamma=2, kind=kind, attractor_type=attractor_type)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=1e-4, rtol=1e-3)


def test_attractor_normed_parity():
    emb_dim, n_bins, n_attr = 16, 8, 4
    x = RNG.standard_normal((2, emb_dim, 6, 6)).astype(np.float32)
    b_prev = RNG.random((2, n_bins, 3, 3)).astype(np.float32)
    prev_emb = RNG.standard_normal((2, emb_dim, 3, 3)).astype(np.float32)
    jp = heads.mlp2_init(jax.random.PRNGKey(4), emb_dim, 128, n_attr * 2)
    tmod = AttractorLayer(emb_dim, n_bins, n_attractors=n_attr,
                          min_depth=1e-3, max_depth=10.0,
                          alpha=300, gamma=2, kind="sum", attractor_type="exp")
    _copy_mlp2(tmod._net, jp)
    with torch.no_grad():
        want_b, want_c = tmod(torch.from_numpy(x), torch.from_numpy(b_prev),
                              torch.from_numpy(prev_emb), interpolate=True)
    got_b, got_c = heads.attractor_normed(
        jp, jnp.asarray(x), jnp.asarray(b_prev), jnp.asarray(prev_emb),
        alpha=300, gamma=2, kind="sum", attractor_type="exp",
        min_depth=1e-3, max_depth=10.0)
    np.testing.assert_allclose(np.asarray(got_b), want_b.numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), atol=1e-4, rtol=1e-3)


def test_conditional_log_binomial_parity():
    in_feats, cond_dim, n_classes = 33, 16, 12
    x = RNG.standard_normal((2, in_feats, 5, 5)).astype(np.float32)
    cond = RNG.standard_normal((2, cond_dim, 5, 5)).astype(np.float32)
    tmod = ConditionalLogBinomial(in_feats, cond_dim, n_classes=n_classes,
                                  bottleneck_factor=2, min_temp=0.0212, max_temp=50.0)
    bottleneck = (in_feats + cond_dim) // 2
    jp = [
        {"w": tmod.mlp[0].weight.detach().numpy(), "b": tmod.mlp[0].bias.detach().numpy()},
        {"w": tmod.mlp[2].weight.detach().numpy(), "b": tmod.mlp[2].bias.detach().numpy()},
    ]
    with torch.no_grad():
        want = tmod(torch.from_numpy(x), torch.from_numpy(cond))
    got = heads.conditional_log_binomial(jp, jnp.asarray(x), jnp.asarray(cond),
                                         n_classes, 0.0212, 50.0)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-4, rtol=1e-3)
