"""Loss parity: JAX contrastive-correlation losses vs torch transcriptions.

The torch code below independently transcribes the reference formulas
(src/modules.py:1231-1367) as an executable spec; inputs/coords are shared so
values must agree to float tolerance.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from depthg_tpu.train.losses import (
    CorrLossConfig,
    contrastive_correlation_loss,
    contrastive_crf_loss,
    corr_helper,
    depth_feature_correlation,
)
from depthg_tpu.train import decay

RNG = np.random.default_rng(42)


def t_norm(t):
    return F.normalize(t, dim=1, eps=1e-10)


def t_corr(a, b):
    return torch.einsum("nchw,ncij->nhwij", a, b)


def t_sample(t, coords):
    return F.grid_sample(t, coords.permute(0, 2, 1, 3), padding_mode="border",
                         align_corners=True)


def t_helper(cfg, f1, f2, c1, c2, shift):
    fd = t_corr(t_norm(f1), t_norm(f2))
    if cfg.pointwise:
        old_mean = fd.mean()
        fd = fd - fd.mean([3, 4], keepdim=True)
        fd = fd - fd.mean() + old_mean
    cd = t_corr(t_norm(c1), t_norm(c2))
    clamped = cd.clamp(cfg.min_val, 0.8) if cfg.stabalize else cd.clamp(cfg.min_val)
    return -clamped * (fd - shift), cd


@pytest.mark.parametrize("pointwise,stabalize", [(True, False), (False, True)])
def test_helper_matches_torch(pointwise, stabalize):
    cfg = CorrLossConfig(pointwise=pointwise, stabalize=stabalize)
    f1, f2 = [RNG.standard_normal((2, 16, 5, 5)).astype(np.float32) for _ in range(2)]
    c1, c2 = [RNG.standard_normal((2, 8, 5, 5)).astype(np.float32) for _ in range(2)]
    want_loss, want_cd = t_helper(cfg, *map(torch.from_numpy, (f1, f2, c1, c2)), 0.12)
    got_loss, got_cd = corr_helper(cfg, *map(jnp.asarray, (f1, f2, c1, c2)), 0.12)
    np.testing.assert_allclose(np.asarray(got_loss), want_loss.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_cd), want_cd.numpy(), atol=1e-5, rtol=1e-4)


def test_depth_feature_correlation_matches_torch():
    cfg = CorrLossConfig()
    c = RNG.standard_normal((2, 8, 6, 6)).astype(np.float32)
    d = RNG.random((2, 1, 48, 48)).astype(np.float32)
    tc, td = torch.from_numpy(c), torch.from_numpy(d)
    cd = t_corr(t_norm(tc), t_norm(tc))
    d_r = F.interpolate(td, size=(6, 6), mode="bilinear", align_corners=True)
    dd = t_corr(t_norm(d_r), t_norm(d_r))
    want = -cd.clamp(0.0) * (dd - 0.03)
    got, got_dd = depth_feature_correlation(cfg, jnp.asarray(c), jnp.asarray(c),
                                            jnp.asarray(d), jnp.asarray(d), 0.03)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dd), dd.numpy(), atol=1e-5, rtol=1e-4)


def test_full_loss_with_fixed_coords_matches_torch():
    """End-to-end value parity given shared coords + perms (random path)."""
    b, cfeat, ccode, hw, s = 4, 16, 8, 12, 5
    cfg = CorrLossConfig(feature_samples=s, neg_samples=3, depth_sampling="none",
                         depth_feat_correlation_loss=False)
    feats = RNG.standard_normal((b, cfeat, hw, hw)).astype(np.float32)
    feats_pos = RNG.standard_normal((b, cfeat, hw, hw)).astype(np.float32)
    code = RNG.standard_normal((b, ccode, hw, hw)).astype(np.float32)
    code_pos = RNG.standard_normal((b, ccode, hw, hw)).astype(np.float32)
    coords1 = (RNG.random((b, s, s, 2)) * 2 - 1).astype(np.float32)
    coords2 = (RNG.random((b, s, s, 2)) * 2 - 1).astype(np.float32)

    out = contrastive_correlation_loss(
        jax.random.PRNGKey(0), cfg,
        jnp.asarray(feats), jnp.asarray(feats_pos),
        jnp.asarray(code), jnp.asarray(code_pos),
        coords_override=(jnp.asarray(coords1), jnp.asarray(coords2)))

    tf, tfp, tc, tcp = map(torch.from_numpy, (feats, feats_pos, code, code_pos))
    tc1, tc2 = map(torch.from_numpy, (coords1, coords2))
    sf, sc = t_sample(tf, tc1), t_sample(tc, tc1)
    sfp, scp = t_sample(tfp, tc2), t_sample(tcp, tc2)

    want_intra, _ = t_helper(cfg, sf, sf, sc, sc, cfg.pos_intra_shift)
    want_inter, _ = t_helper(cfg, sf, sfp, sc, scp, cfg.pos_inter_shift)
    np.testing.assert_allclose(float(out["pos_intra_loss"]), want_intra.mean().item(),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(float(out["pos_inter_loss"]), want_inter.mean().item(),
                               atol=1e-5, rtol=1e-4)

    # negatives recomputed with the perms the jax path drew
    perms = np.asarray(out["neg_perms"])
    neg_vals = []
    for p in perms:
        sfn = t_sample(tf[torch.from_numpy(np.asarray(p, np.int64))], tc2)
        scn = t_sample(tc[torch.from_numpy(np.asarray(p, np.int64))], tc2)
        l, _ = t_helper(cfg, sf, sfn, sc, scn, cfg.neg_inter_shift)
        neg_vals.append(l.numpy())
    want_neg = np.stack(neg_vals)
    np.testing.assert_allclose(np.asarray(out["neg_inter_loss"]), want_neg,
                               atol=1e-5, rtol=1e-4)


def test_contrastive_crf_loss_shape_and_kernel_sign():
    g = jnp.asarray(RNG.random((2, 3, 16, 16)).astype(np.float32))
    k = jnp.asarray(RNG.random((2, 8, 16, 16)).astype(np.float32))
    out = contrastive_crf_loss(jax.random.PRNGKey(1), g, k, n_samples=32,
                               alpha=0.5, beta=0.15, gamma=0.05, w1=10.0, w2=3.0, shift=0.0)
    assert out.shape == (2, 32, 32)
    assert bool(jnp.isfinite(out).all())


def test_decay_schedules_reference_timing():
    dcfg = decay.DecayConfig(depth_loss_decay=True, decay_every_steps=250,
                             depth_loss_decay_factor=0.6, depth_feat_weight=0.19)
    # events at end of steps 250, 500, ...: step 250 still uses init, 251 decayed
    assert decay.depth_feat_weight(dcfg, 0) == pytest.approx(0.19)
    assert decay.depth_feat_weight(dcfg, 250) == pytest.approx(0.19)
    assert decay.depth_feat_weight(dcfg, 251) == pytest.approx(0.19 * 0.6)
    assert decay.depth_feat_weight(dcfg, 501) == pytest.approx(0.19 * 0.36)

    # legacy bug: fps sample decay fires at step 0 (affects step >= 1)
    dcfg2 = decay.DecayConfig(fps_sample_decay=True, fps_sample_decay_every_steps=300,
                              fps_sample_decay_factor=0.9, feature_samples=11,
                              fps_min_samples=0)
    assert decay.sampling_schedule(dcfg2, 0) == ("fps", 11)
    assert decay.sampling_schedule(dcfg2, 1) == ("fps", 9)   # int(11*0.9)=9
    assert decay.sampling_schedule(dcfg2, 300) == ("fps", 9)
    assert decay.sampling_schedule(dcfg2, 301) == ("fps", 8)  # int(9*0.9)=8

    # fps_until_step switches mode off starting the step after the threshold
    dcfg3 = decay.DecayConfig(fps_until_step=100, post_fps_samples=7, feature_samples=11)
    assert decay.sampling_schedule(dcfg3, 100) == ("fps", 11)
    assert decay.sampling_schedule(dcfg3, 101) == ("none", 7)


def test_fps_until_step_interacts_with_sample_decay():
    # reference: past fps_until_step, the overwrite to post_fps_samples is
    # re-decayed on decay-event steps (train_segmentation.py:361-375)
    dcfg = decay.DecayConfig(fps_until_step=100, post_fps_samples=11,
                             fps_sample_decay=True,
                             fps_sample_decay_every_steps=50,
                             fps_sample_decay_factor=0.9, fps_min_samples=2,
                             feature_samples=11)
    assert decay.sampling_schedule(dcfg, 120) == ("none", 11)
    # event fired at end of step 150 -> step 151 uses int(11*0.9)=9
    assert decay.sampling_schedule(dcfg, 151) == ("none", 9)
    assert decay.sampling_schedule(dcfg, 152) == ("none", 11)
