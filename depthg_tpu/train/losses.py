"""Contrastive feature-correlation losses (STEGO + DepthG extensions).

Pure-functional re-design of the reference loss modules
(``src/modules.py:1221-1463`` and ``src/modules.py:1510-1543``):

* explicit PRNG keys instead of global torch RNG;
* coordinate selection (random / uniform-pixel / depth-FPS / salience) is
  device-resident — the reference's host-numpy FPS round trip
  (``src/modules.py:1304-1311``) becomes the batched scan in ``ops.depth``;
* the 5 negative samples are a ``vmap`` over permutations rather than a python
  loop, with per-sample reductions preserved exactly (the pointwise centering
  in ``helper`` takes per-call means, so negatives cannot be folded into one
  batch without changing the math);
* everything compiles to a handful of MXU matmuls + VPU elementwise ops in one
  jitted program.

The sampled-coordinate tensors have static shape [B, S, S, 2] where
S = feature_samples comes from the (host-side) decay schedule — S changes
trigger a bucketed recompile, mirroring the reference's shape-changing decay
(``src/train_segmentation.py:370-375``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from depthg_tpu.ops.correlation import norm, tensor_correlation
from depthg_tpu.ops.depth import farthest_point_sampling_depth, uniform_pixel_coords
from depthg_tpu.ops.resize import resize_bilinear
from depthg_tpu.ops.sampling import random_coords, sample, super_perm


@dataclasses.dataclass(frozen=True)
class CorrLossConfig:
    feature_samples: int = 11
    neg_samples: int = 5
    pos_intra_shift: float = 0.08
    pos_inter_shift: float = 0.02
    neg_inter_shift: float = 0.66
    depth_feat_shift: float = 0.0
    pointwise: bool = True
    zero_clamp: bool = True
    stabalize: bool = False  # sic — reference spelling
    depth_sampling: str = "fps"  # "fps" | "simple" | "none" | "fps_depth_feat"
    depth_feat_correlation_loss: bool = True
    use_salience: bool = False

    @property
    def min_val(self) -> float:
        return 0.0 if self.zero_clamp else -9999.0


def from_cfg(cfg) -> CorrLossConfig:
    return CorrLossConfig(
        feature_samples=int(cfg.feature_samples),
        neg_samples=int(cfg.neg_samples),
        pos_intra_shift=float(cfg.pos_intra_shift),
        pos_inter_shift=float(cfg.pos_inter_shift),
        neg_inter_shift=float(cfg.neg_inter_shift),
        depth_feat_shift=float(cfg.depth_feat_shift),
        pointwise=bool(cfg.pointwise),
        zero_clamp=bool(cfg.zero_clamp),
        stabalize=bool(cfg.stabalize),
        depth_sampling=str(cfg.depth_sampling),
        depth_feat_correlation_loss=bool(cfg.depth_feat_correlation_loss),
        use_salience=bool(cfg.use_salience),
    )


def corr_helper(lcfg: CorrLossConfig, f1, f2, c1, c2, shift: float):
    """loss = -clamp(code_corr) * (feat_corr - shift); feat side is stop-grad.

    Mirrors reference ``helper`` (``src/modules.py:1231-1254``) including the
    pointwise mean-centering dance.
    """
    fd = tensor_correlation(norm(f1), norm(f2))
    if lcfg.pointwise:
        old_mean = fd.mean()
        fd = fd - fd.mean(axis=(3, 4), keepdims=True)
        fd = fd - fd.mean() + old_mean
    fd = jax.lax.stop_gradient(fd)

    cd = tensor_correlation(norm(c1), norm(c2))

    if lcfg.stabalize:
        clamped = jnp.clip(cd, lcfg.min_val, 0.8)
    else:
        clamped = jnp.clip(cd, lcfg.min_val, None)
    loss = -clamped * (fd - shift)
    return loss, cd


def depth_feature_correlation(lcfg: CorrLossConfig, c1, c2, d1, d2, shift: float):
    """Depth-code correlation term, reference ``src/modules.py:1256-1278``.

    Depth maps are bilinearly resized (align_corners=True) to the sampled code
    grid and channel-normalized; with C=1 that normalization reduces depth to
    its sign pattern — reference behavior preserved deliberately.
    """
    cd = tensor_correlation(norm(c1), norm(c2))
    d1 = resize_bilinear(d1, c1.shape[2:], align_corners=True)
    d2 = resize_bilinear(d2, c2.shape[2:], align_corners=True)
    dd = tensor_correlation(norm(d1), norm(d2))
    dd = jax.lax.stop_gradient(dd)
    if lcfg.stabalize:
        clamped = jnp.clip(cd, lcfg.min_val, 0.8)
    else:
        clamped = jnp.clip(cd, lcfg.min_val, None)
    loss = -clamped * (dd - shift)
    return loss, dd


def _salience_coords(key, salience, coord_shape):
    """Device version of ``sample_nonzero_locations`` (``src/modules.py:1191-1204``):
    uniform draw over the nonzero entries of the salience map (uniform over all
    pixels if empty), with the reference's normalize-by-H / flip quirks."""
    b, s1, s2, _ = coord_shape
    h, w = salience.shape[-2:]
    n = s1 * s2
    flat = salience.reshape(b, h * w)
    nonzero = flat > 0
    any_nz = nonzero.any(axis=1, keepdims=True)
    logits = jnp.where(nonzero | ~any_nz, 0.0, -jnp.inf)
    idx = jax.vmap(lambda k, lg: jax.random.categorical(k, lg, shape=(n,)))(
        jax.random.split(key, b), logits)
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    coords = jnp.stack([rows, cols], axis=-1).reshape(b, s1, s2, 2)
    coords = coords / h * 2 - 1  # reference divides both axes by t.shape[1]
    return jnp.flip(coords, axis=-1)


def select_coords(key, lcfg: CorrLossConfig, feats, feats_pos, depth, depth_pos,
                  salience=None, salience_pos=None):
    """Pick the two coordinate grids per reference ``forward``
    (``src/modules.py:1287-1321``). Returns coords in [-1, 1]."""
    b = feats.shape[0]
    s = lcfg.feature_samples
    coord_shape = (b, s, s, 2)
    k1, k2, k3 = jax.random.split(key, 3)

    if lcfg.use_salience:
        c1_nz = _salience_coords(k1, salience, coord_shape)
        c2_nz = _salience_coords(k2, salience_pos, coord_shape)
        km1, km2, km3 = jax.random.split(k3, 3)
        c1_reg = random_coords(km1, coord_shape)
        c2_reg = random_coords(km2, coord_shape)
        mask = (jax.random.uniform(km3, coord_shape[:-1]) > 0.1)[..., None].astype(jnp.float32)
        return c1_nz * mask + c1_reg * (1 - mask), c2_nz * mask + c2_reg * (1 - mask)
    if lcfg.depth_sampling == "simple":
        hw = (feats.shape[-2], feats.shape[-1])
        return (uniform_pixel_coords(k1, b, s, hw) * 2 - 1,
                uniform_pixel_coords(k2, b, s, hw) * 2 - 1)
    if lcfg.depth_sampling in ("fps", "fps_depth_feat"):
        # "fps_depth_feat" intentionally behaves like "fps": the reference
        # passes include_feats=True but its farthest_point_sampling_depth
        # ignores the flag and always runs plain depth FPS
        # (src/modules.py:999-1020). The joint sampler itself exists as
        # ops.depth.fps_depth_feats_indices for parity with the (unused)
        # reference fps_depth_feats.
        # TPU: both images' FPS run as ONE batched scan (the scan is the
        # only sequential part of the step — halving scan count matters).
        both = farthest_point_sampling_depth(
            jnp.concatenate([feats, feats_pos], axis=0),
            jnp.concatenate([depth, depth_pos], axis=0), s) * 2 - 1
        return both[: feats.shape[0]], both[feats.shape[0]:]
    return random_coords(k1, coord_shape), random_coords(k2, coord_shape)


def contrastive_correlation_loss(key: jax.Array, lcfg: CorrLossConfig,
                                 orig_feats, orig_feats_pos,
                                 orig_code, orig_code_pos,
                                 depth=None, depth_pos=None,
                                 salience=None, salience_pos=None,
                                 coords_override=None,
                                 depth_feat_shift=None):
    """Full DepthG contrastive loss. Returns a dict of losses and cds.

    ``coords_override=(coords1, coords2)`` bypasses sampling (parity tests).
    ``depth_feat_shift`` may be a traced scalar (decay schedule); defaults to
    the static config value.
    """
    kc, kn = jax.random.split(key)
    if coords_override is not None:
        coords1, coords2 = coords_override
    else:
        coords1, coords2 = select_coords(kc, lcfg, orig_feats, orig_feats_pos,
                                         depth, depth_pos, salience, salience_pos)

    feats = sample(orig_feats, coords1)
    code = sample(orig_code, coords1)
    feats_pos = sample(orig_feats_pos, coords2)
    code_pos = sample(orig_code_pos, coords2)

    pos_intra_loss, pos_intra_cd = corr_helper(lcfg, feats, feats, code, code,
                                               lcfg.pos_intra_shift)
    pos_inter_loss, pos_inter_cd = corr_helper(lcfg, feats, feats_pos, code, code_pos,
                                               lcfg.pos_inter_shift)

    out = {
        "pos_intra_loss": pos_intra_loss.mean(),
        "pos_intra_cd": pos_intra_cd,
        "pos_inter_loss": pos_inter_loss.mean(),
        "pos_inter_cd": pos_inter_cd,
    }

    if lcfg.depth_feat_correlation_loss:
        shift = lcfg.depth_feat_shift if depth_feat_shift is None else depth_feat_shift
        df_loss, df_cd = depth_feature_correlation(lcfg, code, code, depth, depth,
                                                   shift)
        out["depth_feat_loss"] = df_loss.mean()
        out["depth_feat_cd"] = df_cd

    # negatives: vmap over independent permutations; per-sample helper means
    # (incl. pointwise centering) match the reference's separate calls exactly
    perms = jax.vmap(lambda k: super_perm(k, orig_feats.shape[0]))(
        jax.random.split(kn, lcfg.neg_samples))

    def one_neg(perm):
        feats_neg = sample(orig_feats[perm], coords2)
        code_neg = sample(orig_code[perm], coords2)
        return corr_helper(lcfg, feats, feats_neg, code, code_neg, lcfg.neg_inter_shift)

    neg_losses, neg_cds = jax.vmap(one_neg)(perms)
    out["neg_inter_loss"] = neg_losses  # [neg, B, S, S, S, S]; caller means
    out["neg_inter_cd"] = neg_cds
    out["neg_perms"] = perms  # exposed for observability / parity tests
    out["coords"] = (coords1, coords2)
    return out


def depth_contrastive_correlation_loss(key: jax.Array, lcfg: CorrLossConfig,
                                       orig_feats, orig_feats_pos,
                                       orig_code, orig_code_pos,
                                       depth_aug_feats, depth_aug_feats_pos,
                                       salience=None, salience_pos=None,
                                       coords_override=None):
    """``use_depth_only_intra`` variant (``src/modules.py:1370-1463``):
    pos_intra runs on depth-augmented feats; coords are random/salience only."""
    kc, kn = jax.random.split(key)
    if coords_override is not None:
        coords1, coords2 = coords_override
    else:
        rand_cfg = dataclasses.replace(lcfg, depth_sampling="none")
        coords1, coords2 = select_coords(kc, rand_cfg, orig_feats, orig_feats_pos,
                                         None, None, salience, salience_pos)

    feats = sample(orig_feats, coords1)
    code = sample(orig_code, coords1)
    feats_pos = sample(orig_feats_pos, coords2)
    code_pos = sample(orig_code_pos, coords2)
    d_feats = sample(depth_aug_feats, coords1)

    pos_intra_loss, pos_intra_cd = corr_helper(lcfg, d_feats, d_feats, code, code,
                                               lcfg.pos_intra_shift)
    pos_inter_loss, pos_inter_cd = corr_helper(lcfg, feats, feats_pos, code, code_pos,
                                               lcfg.pos_inter_shift)

    perms = jax.vmap(lambda k: super_perm(k, orig_feats.shape[0]))(
        jax.random.split(kn, lcfg.neg_samples))

    def one_neg(perm):
        feats_neg = sample(orig_feats[perm], coords2)
        code_neg = sample(orig_code[perm], coords2)
        return corr_helper(lcfg, feats, feats_neg, code, code_neg, lcfg.neg_inter_shift)

    neg_losses, neg_cds = jax.vmap(one_neg)(perms)
    return {
        "pos_intra_loss": pos_intra_loss.mean(),
        "pos_intra_cd": pos_intra_cd,
        "pos_inter_loss": pos_inter_loss.mean(),
        "pos_inter_cd": pos_inter_cd,
        "neg_inter_loss": neg_losses,
        "neg_inter_cd": neg_cds,
    }


def intra_depth_feature_diversity_loss(feats, depth):
    """Reference ``IntraDepthFeatureDiversityLoss`` (``src/modules.py:1466-1471``)
    is an empty stub (forward returns None); mirrored for inventory parity."""
    return None


def contrastive_crf_loss(key: jax.Array, guidance, clusters, n_samples: int,
                         alpha: float, beta: float, gamma: float,
                         w1: float, w2: float, shift: float):
    """Training-time CRF regularizer (``src/modules.py:1510-1543``).

    One shared coordinate set across the batch; RGB+XY Gaussian kernel against
    cluster self-similarity.
    """
    h, w = guidance.shape[-2:]
    kh, kw = jax.random.split(key)
    coords_r = jax.random.randint(kh, (n_samples,), 0, h)
    coords_c = jax.random.randint(kw, (n_samples,), 0, w)

    flat_idx = coords_r * w + coords_c
    sel_g = guidance.reshape(*guidance.shape[:2], h * w)[:, :, flat_idx]  # [B, C, n]
    sel_k = clusters.reshape(*clusters.shape[:2], h * w)[:, :, flat_idx]

    coords = jnp.stack([coords_r, coords_c]).astype(jnp.float32)  # [2, n]
    coord_diff = jnp.square(coords[:, :, None] - coords[:, None, :]).sum(0)[None]
    guidance_diff = jnp.square(sel_g[:, :, :, None] - sel_g[:, :, None, :]).sum(1)

    sim_kernel = (w1 * jnp.exp(-coord_diff / (2 * alpha) - guidance_diff / (2 * beta))
                  + w2 * jnp.exp(-coord_diff / (2 * gamma)) - shift)
    cluster_sims = jnp.einsum("nka,nkb->nab", sel_k, sel_k,
                              precision=jax.lax.Precision.HIGHEST)
    return -(cluster_sims * sim_kernel)
