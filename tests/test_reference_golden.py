"""Golden tests against the ACTUAL reference code (imported with stubbed deps):
ClusterLookup, ContrastiveCorrelationLoss.helper/depth_feature_correlation,
full loss forward with shared coords/perms, and UnsupervisedMetrics."""

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
from depthg_tpu.models.probes import cluster_lookup_apply
from depthg_tpu.train.losses import CorrLossConfig, contrastive_correlation_loss, corr_helper
from depthg_tpu.utils.metrics import SegMetrics

RNG = np.random.default_rng(33)


def test_cluster_lookup_golden():
    tmod = ref_modules.ClusterLookup(8, 5)
    clusters = tmod.clusters.detach().numpy()
    x = RNG.standard_normal((2, 8, 6, 6)).astype(np.float32)

    want_loss, want_probs = tmod(torch.from_numpy(x), None)
    got_loss, got_probs = cluster_lookup_apply({"clusters": jnp.asarray(clusters)},
                                               jnp.asarray(x), None)
    np.testing.assert_allclose(float(got_loss), want_loss.item(), atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(np.asarray(got_probs), want_probs.detach().numpy())

    want_lp = tmod(torch.from_numpy(x), 2.0, log_probs=True)
    got_lp = cluster_lookup_apply({"clusters": jnp.asarray(clusters)},
                                  jnp.asarray(x), 2.0, log_probs=True)
    np.testing.assert_allclose(np.asarray(got_lp), want_lp.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


def _ref_loss(cfg_dict):
    return ref_modules.ContrastiveCorrelationLoss(Config(cfg_dict))


@pytest.mark.parametrize("pointwise,zero_clamp,stabalize",
                         [(True, True, False), (False, False, True)])
def test_corr_helper_golden(pointwise, zero_clamp, stabalize):
    cfg = dict(pointwise=pointwise, zero_clamp=zero_clamp, stabalize=stabalize)
    ref = _ref_loss(cfg)
    f1, f2 = [RNG.standard_normal((2, 12, 5, 5)).astype(np.float32) for _ in range(2)]
    c1, c2 = [RNG.standard_normal((2, 6, 5, 5)).astype(np.float32) for _ in range(2)]
    with torch.no_grad():
        want_loss, want_cd = ref.helper(*map(torch.from_numpy, (f1, f2, c1, c2)), 0.07)
    jcfg = CorrLossConfig(pointwise=pointwise, zero_clamp=zero_clamp, stabalize=stabalize)
    got_loss, got_cd = corr_helper(jcfg, *map(jnp.asarray, (f1, f2, c1, c2)), 0.07)
    np.testing.assert_allclose(np.asarray(got_loss), want_loss.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cd), want_cd.numpy(), atol=1e-5, rtol=1e-4)


def test_full_corr_loss_golden_shared_coords():
    """Run the reference forward with torch-seeded randomness, then replay the
    same coords/perms through the JAX loss and require identical values."""
    cfg = dict(pointwise=True, zero_clamp=True, stabalize=False,
               feature_samples=5, neg_samples=2, use_salience=False,
               depth_sampling="none", depth_feat_correlation_loss=True,
               depth_feat_shift=0.03, pos_intra_shift=0.08, pos_inter_shift=0.02,
               neg_inter_shift=0.66)
    ref = _ref_loss(cfg)

    b = 4
    feats = RNG.standard_normal((b, 12, 10, 10)).astype(np.float32)
    feats_pos = RNG.standard_normal((b, 12, 10, 10)).astype(np.float32)
    code = RNG.standard_normal((b, 6, 10, 10)).astype(np.float32)
    code_pos = RNG.standard_normal((b, 6, 10, 10)).astype(np.float32)
    depth = RNG.random((b, 1, 40, 40)).astype(np.float32)

    # capture the reference's random draws so both sides use the same ones
    drawn = {}
    real_rand = torch.rand
    real_super_perm = ref_modules.super_perm

    def fake_rand(*shape, **kw):
        out = real_rand(*shape, **kw)
        drawn.setdefault("coords", []).append(out.clone())
        return out

    perms = []
    def fake_super_perm(n, device):
        out = real_super_perm(n, device)
        perms.append(out.clone())
        return out

    torch.rand = fake_rand
    ref_modules.super_perm = fake_super_perm
    try:
        with torch.no_grad():
            out_ref = ref(
                torch.from_numpy(feats), torch.from_numpy(feats_pos), None, None,
                torch.from_numpy(code), torch.from_numpy(code_pos),
                torch.from_numpy(depth), torch.from_numpy(depth))
    finally:
        torch.rand = real_rand
        ref_modules.super_perm = real_super_perm

    # the reference maps its raw torch.rand draws to [-1, 1] (modules.py:1320-1321)
    coords1 = (drawn["coords"][0].numpy() * 2 - 1).astype(np.float32)
    coords2 = (drawn["coords"][1].numpy() * 2 - 1).astype(np.float32)

    # replay through JAX: same coords; negatives recomputed per captured perm
    jcfg = CorrLossConfig(feature_samples=5, neg_samples=2, depth_sampling="none",
                          depth_feat_correlation_loss=True, depth_feat_shift=0.03,
                          pos_intra_shift=0.08, pos_inter_shift=0.02,
                          neg_inter_shift=0.66)
    out = contrastive_correlation_loss(
        jax.random.PRNGKey(0), jcfg,
        jnp.asarray(feats), jnp.asarray(feats_pos),
        jnp.asarray(code), jnp.asarray(code_pos),
        depth=jnp.asarray(depth), depth_pos=jnp.asarray(depth),
        coords_override=(jnp.asarray(coords1), jnp.asarray(coords2)))

    (pos_intra_l, _, pos_inter_l, _, neg_l, _, df_l, df_cd) = out_ref
    np.testing.assert_allclose(float(out["pos_intra_loss"]), pos_intra_l.item(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["pos_inter_loss"]), pos_inter_l.item(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["depth_feat_loss"]), df_l.item(),
                               atol=1e-5, rtol=1e-4)

    # negatives: recompute the JAX side with the reference's captured perms
    from depthg_tpu.ops.sampling import sample as jsample

    sf = jsample(jnp.asarray(feats), jnp.asarray(coords1))
    sc = jsample(jnp.asarray(code), jnp.asarray(coords1))
    neg_vals = []
    for p in perms:
        perm = jnp.asarray(p.numpy())
        fn = jsample(jnp.asarray(feats)[perm], jnp.asarray(coords2))
        cn = jsample(jnp.asarray(code)[perm], jnp.asarray(coords2))
        l, _ = corr_helper(jcfg, sf, fn, sc, cn, 0.66)
        neg_vals.append(np.asarray(l))
    np.testing.assert_allclose(np.concatenate(neg_vals, axis=0), neg_l.numpy(),
                               atol=1e-5, rtol=1e-4)


def test_unsupervised_metrics_golden():
    ref_m = ref_utils.UnsupervisedMetrics("t/", 5, 0, True)
    mine = SegMetrics("t/", 5, 0, True)
    rng = np.random.default_rng(4)
    for _ in range(3):
        t = rng.integers(-1, 5, size=(2, 16, 16))
        p = rng.integers(0, 5, size=(2, 16, 16))
        ref_m.update(torch.from_numpy(p), torch.from_numpy(t))
        mine.update(p, t)
    want = ref_m.compute()
    got = mine.compute()
    assert got.keys() == want.keys()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)
    np.testing.assert_array_equal(mine.stats, ref_m.stats.numpy())


def test_unsupervised_metrics_extra_clusters_golden():
    ref_m = ref_utils.UnsupervisedMetrics("t/", 4, 3, True)
    mine = SegMetrics("t/", 4, 3, True)
    rng = np.random.default_rng(5)
    t = rng.integers(-1, 4, size=(4, 16, 16))
    p = rng.integers(0, 7, size=(4, 16, 16))
    ref_m.update(torch.from_numpy(p), torch.from_numpy(t))
    mine.update(p, t)
    want = ref_m.compute()
    got = mine.compute()
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6)
    # cluster mapping must also agree
    clusters = rng.integers(0, 7, size=(50,))
    np.testing.assert_array_equal(
        mine.map_clusters(clusters),
        ref_m.map_clusters(torch.from_numpy(clusters)).numpy())
