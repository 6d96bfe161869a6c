"""Depth-guided sampling: back-projection and device-resident farthest-point sampling.

The reference runs FPS per image in a host numpy loop
(``src/modules.py:939-985`` + ``src/modules.py:999-1037``), forcing a
GPU->CPU->GPU round trip every training step. Here FPS is a batched
``lax.scan`` over the S*S selection steps — each step is a fully vectorized
[B, P] distance update + masked argmax on the VPU, so the whole sampler stays
in HBM/VMEM and costs ~S^2 fused vector ops.

``depth2points`` reproduces the reference pinhole back-projection *including*
its quirk of passing fov in degrees to a radians ``tan``
(``src/modules.py:988-996``: factor = 2*tan(90/2) with 45 interpreted as
radians) — sampling geometry must match the reference's training dynamics,
not its intent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthg_tpu.ops.resize import adaptive_avg_pool2d


def depth2points(depth: jnp.ndarray, fov: float = 30.0, far: float = 5.0) -> jnp.ndarray:
    """Back-project a depth map [H, W] (or [1, H, W]) to XYZ [3, H, W]."""
    if depth.ndim == 3:
        depth = depth[0]
    h, w = depth.shape[-2], depth.shape[-1]
    # NOTE: fov is in *degrees* but tan treats it as radians — reference behavior.
    factor = 2.0 * jnp.tan(jnp.asarray(fov, depth.dtype) / 2.0)
    yy = jnp.arange(h, dtype=depth.dtype)[:, None]
    xx = jnp.arange(w, dtype=depth.dtype)[None, :]
    y = factor * depth * (yy - h / 2.0) / h
    x = factor * depth * (xx - w / 2.0) / w
    return jnp.stack([jnp.broadcast_to(x, depth.shape),
                      jnp.broadcast_to(y, depth.shape),
                      -depth * far])


def fps_indices(points: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Farthest-point sampling over points [P, D] -> selected indices [n_samples].

    Matches the reference host loop (``src/modules.py:939-985``): start at index
    0; each step picks the not-yet-chosen point with the largest min-distance to
    the chosen set, ties broken by lowest index (argmax-first semantics).
    """
    p = points.shape[0]
    points = points.astype(jnp.float32)

    def step(carry, _):
        dists, chosen, last = carry
        d2 = jnp.sum(jnp.square(points - points[last]), axis=-1)
        dists = jnp.minimum(dists, d2)
        nxt = jnp.argmax(jnp.where(chosen, -jnp.inf, dists))
        return (dists, chosen.at[nxt].set(True), nxt), nxt

    init = (jnp.full((p,), jnp.inf, jnp.float32),
            jnp.zeros((p,), bool).at[0].set(True),
            jnp.asarray(0, jnp.int32))
    (_, _, _), rest = jax.lax.scan(step, init, None, length=n_samples - 1)
    return jnp.concatenate([jnp.zeros((1,), rest.dtype), rest])


def _fps_coords_single(depth_hw: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """FPS over one back-projected depth map -> [S, S, 2] coords in [0, 1).

    Mirrors ``farthest_point_sampling_depth`` (``src/modules.py:1014-1033``):
    the selected flat indices are re-sorted row-major (binary mask + nonzero in
    the reference), split into (row, col), normalized by (H, W), and reshaped to
    an S x S grid.
    """
    h, w = depth_hw.shape
    cloud = jnp.transpose(depth2points(depth_hw, fov=90.0), (1, 2, 0)).reshape(-1, 3)
    inds = jnp.sort(fps_indices(cloud, n_samples * n_samples))
    rows = (inds // w).astype(jnp.float32) / h
    cols = (inds % w).astype(jnp.float32) / w
    return jnp.stack([rows, cols], axis=-1).reshape(n_samples, n_samples, 2)


def farthest_point_sampling_depth(t: jnp.ndarray, depth: jnp.ndarray, n_samples: int) -> jnp.ndarray:
    """Depth-guided FPS coords for a batch.

    t: [B, C, h, w] feature grid (defines the sampling resolution),
    depth: [B, 1, H, W]; returns [B, S, S, 2] in [0, 1) (caller maps to [-1, 1]).
    """
    target = (t.shape[-2], t.shape[-1])
    depth_small = adaptive_avg_pool2d(depth, target)[:, 0]
    return jax.vmap(lambda d: _fps_coords_single(d, n_samples))(depth_small)


def fps_depth_feats_indices(points: jnp.ndarray, feats: jnp.ndarray,
                            n_samples: int) -> jnp.ndarray:
    """Joint depth+feature farthest-point sampling (reference
    ``fps_depth_feats``, ``src/modules.py:1124-1180``): per step, the point
    and feature distances to the last pick are each max-normalized, summed,
    min-pooled into the running distances, then argmax picks the next point.
    (Defined-but-unused in the reference's main path; provided for parity.)
    """
    p = points.shape[0]
    points = points.astype(jnp.float32)
    feats = feats.astype(jnp.float32)

    def step(carry, _):
        dists, chosen, last = carry
        dp = jnp.sum(jnp.square(points - points[last]), axis=-1)
        df = jnp.sum(jnp.square(feats - feats[last]), axis=-1)
        dp = dp / jnp.maximum(dp.max(), 1e-20)
        df = df / jnp.maximum(df.max(), 1e-20)
        dists = jnp.minimum(dists, dp + df)
        nxt = jnp.argmax(jnp.where(chosen, -jnp.inf, dists))
        return (dists, chosen.at[nxt].set(True), nxt), nxt

    init = (jnp.full((p,), jnp.inf, jnp.float32),
            jnp.zeros((p,), bool).at[0].set(True),
            jnp.asarray(0, jnp.int32))
    _, rest = jax.lax.scan(step, init, None, length=n_samples - 1)
    return jnp.concatenate([jnp.zeros((1,), rest.dtype), rest])


def knn_for_coords(feats: jnp.ndarray, coords: jnp.ndarray,
                   samples_per_coord: int) -> jnp.ndarray:
    """Per-anchor feature-space nearest neighbors with visited-zeroing
    (reference ``src/modules.py:1068-1119``; defined but not called in the
    reference's main path). feats: [B, C, H, W], coords: [B, S, S, 2] in
    [0, 1); returns [B, S*S*(1+k), 2] anchor+neighbor coords."""
    assert samples_per_coord > 0, "Not enough samples per coord"
    b, c, h, w = feats.shape
    k = samples_per_coord

    def per_image(fmap, crds):
        grid = jnp.transpose(fmap, (1, 2, 0)).reshape(-1, c)  # [HW, C]
        flat_coords = crds.reshape(-1, 2)
        anchor_idx = ((flat_coords[:, 0] * h).astype(jnp.int32) * w
                      + (flat_coords[:, 1] * w).astype(jnp.int32))

        def visit(grid_state, aidx):
            anchor = grid_state[aidx]
            d = jnp.sqrt(jnp.sum(jnp.square(grid_state - anchor), axis=-1))
            d = jnp.where(d == 0.0, jnp.inf, d)  # reference zero->inf quirk
            _, nn_idx = jax.lax.top_k(-d, k + 1)
            grid_state = grid_state.at[nn_idx].set(0.0)  # zero visited feats
            nn_sorted = jnp.sort(nn_idx)  # reference rebuilds via mask+nonzero
            rows = (nn_sorted // w).astype(jnp.float32) / h
            cols = (nn_sorted % w).astype(jnp.float32) / w
            return grid_state, jnp.stack([rows, cols], axis=-1)

        _, nns = jax.lax.scan(visit, grid, anchor_idx)
        return jnp.concatenate([flat_coords, nns.reshape(-1, 2)], axis=0)

    return jax.vmap(per_image)(feats, coords)


def uniform_pixel_coords(key: jax.Array, batch: int, n_samples: int, hw) -> jnp.ndarray:
    """Device-native equivalent of ``simple_depth_informed_sampling``
    (``src/modules.py:828-883``).

    The reference samples a depth bin proportional to its pixel count, then a
    uniform pixel within that bin — which is exactly a uniform distribution over
    pixels. We sample pixel centers uniformly: coords [B, S, S, 2] in (0, 1).
    """
    h, w = hw
    kr, kc = jax.random.split(key)
    rows = jax.random.randint(kr, (batch, n_samples, n_samples), 0, h)
    cols = jax.random.randint(kc, (batch, n_samples, n_samples), 0, w)
    coords = jnp.stack([(rows + 0.5) / h, (cols + 0.5) / w], axis=-1)
    return coords.astype(jnp.float32)
