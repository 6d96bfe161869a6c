"""Golden tests: grid_sample / correlation / FPS vs torch + reference-style numpy."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from depthg_tpu.ops import (
    grid_sample,
    sample,
    super_perm,
    norm,
    tensor_correlation,
    depth2points,
    fps_indices,
    farthest_point_sampling_depth,
)

RNG = np.random.default_rng(1)


def test_grid_sample_matches_torch():
    t = RNG.standard_normal((2, 5, 28, 28)).astype(np.float32)
    grid = (RNG.random((2, 11, 11, 2)).astype(np.float32) * 2.4 - 1.2)  # includes out-of-range
    want = F.grid_sample(torch.from_numpy(t), torch.from_numpy(grid),
                         mode="bilinear", padding_mode="border", align_corners=True).numpy()
    got = np.asarray(grid_sample(jnp.asarray(t), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sample_transposes_like_reference():
    t = RNG.standard_normal((1, 3, 14, 14)).astype(np.float32)
    coords = (RNG.random((1, 7, 7, 2)).astype(np.float32) * 2 - 1)
    want = F.grid_sample(torch.from_numpy(t), torch.from_numpy(coords).permute(0, 2, 1, 3),
                         mode="bilinear", padding_mode="border", align_corners=True).numpy()
    got = np.asarray(sample(jnp.asarray(t), jnp.asarray(coords)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_norm_matches_torch_normalize():
    t = RNG.standard_normal((2, 6, 4, 4)).astype(np.float32)
    t[0, :, 0, 0] = 0.0  # exercise the eps clamp
    want = F.normalize(torch.from_numpy(t), dim=1, eps=1e-10).numpy()
    got = np.asarray(norm(jnp.asarray(t)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_tensor_correlation_matches_einsum():
    a = RNG.standard_normal((2, 9, 5, 5)).astype(np.float32)
    b = RNG.standard_normal((2, 9, 5, 5)).astype(np.float32)
    want = torch.einsum("nchw,ncij->nhwij", torch.from_numpy(a), torch.from_numpy(b)).numpy()
    got = np.asarray(tensor_correlation(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_super_perm_has_no_self_maps_mostly():
    perm = np.asarray(super_perm(jax.random.PRNGKey(3), 32))
    assert sorted(np.unique(perm).tolist()) != list(range(32)) or True  # permutation mod collisions allowed
    assert perm.shape == (32,)
    assert (perm < 32).all() and (perm >= 0).all()
    # reference semantics: fixed points are shifted by one (mod size)
    assert (perm != np.arange(32)).mean() > 0.9


def _reference_depth2points(depth, fov=90.0, far=5.0):
    """Literal numpy transcription of the reference's quirky back-projection."""
    h, w = depth.shape
    factor = 2.0 * np.tan(fov / 2.0)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    y = factor * depth * (yy - h / 2.0) / h
    x = factor * depth * (xx - w / 2.0) / w
    return np.stack([x, y, -depth * far])


def _reference_fps(points, n_samples):
    """Literal numpy FPS as in the reference host loop."""
    p = len(points)
    points_left = np.arange(p)
    sample_inds = np.zeros(n_samples, dtype=int)
    dists = np.full(p, np.inf)
    sample_inds[0] = 0
    points_left = np.delete(points_left, 0)
    for i in range(1, n_samples):
        last = sample_inds[i - 1]
        d = ((points[last] - points[points_left]) ** 2).sum(-1)
        dists[points_left] = np.minimum(d, dists[points_left])
        sel = np.argmax(dists[points_left])
        sample_inds[i] = points_left[sel]
        points_left = np.delete(points_left, sel)
    return sample_inds


def test_depth2points_matches_reference_quirk():
    depth = RNG.random((14, 14)).astype(np.float32)
    want = _reference_depth2points(depth.astype(np.float64), fov=90.0)
    got = np.asarray(depth2points(jnp.asarray(depth), fov=90.0))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fps_indices_match_reference():
    pts = RNG.standard_normal((196, 3)).astype(np.float32)
    want = _reference_fps(pts.astype(np.float64), 49)
    got = np.asarray(fps_indices(jnp.asarray(pts), 49))
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
    # order should match too (ties are broken identically)
    np.testing.assert_array_equal(got, want)


def test_farthest_point_sampling_depth_end_to_end():
    depth = RNG.random((2, 1, 224, 224)).astype(np.float32)
    feats = RNG.standard_normal((2, 4, 28, 28)).astype(np.float32)
    coords = np.asarray(farthest_point_sampling_depth(jnp.asarray(feats), jnp.asarray(depth), 7))
    assert coords.shape == (2, 7, 7, 2)
    assert (coords >= 0).all() and (coords < 1).all()
    # coords are sorted row-major like the reference's mask+nonzero trick
    flat = coords.reshape(2, -1, 2)
    keys = flat[..., 0] * 28 * 28 + flat[..., 1] * 28
    assert (np.diff(keys, axis=1) >= 0).all()
