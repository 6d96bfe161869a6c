"""Coordinate sampling and gathers used by the contrastive correlation loss.

``grid_sample`` mirrors torch ``F.grid_sample(..., mode='bilinear',
padding_mode='border', align_corners=True)`` exactly — the only configuration
the reference uses (``src/modules.py:822-825``). The gather is flattened to a
single ``take_along_axis`` over H*W so XLA lowers it to one dynamic-gather.

``super_perm`` reproduces the reference's derangement-ish negative-batch
permutation (``src/modules.py:1184-1188``) with an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(t: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear border-padded align_corners=True sampling.

    t: [B, C, H, W]; grid: [B, Hg, Wg, 2] with (x, y) in [-1, 1]
    returns [B, C, Hg, Wg].
    """
    b, c, h, w = t.shape
    _, hg, wg, _ = grid.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    # align_corners=True unnormalization, then border clamping of the coordinate
    ix = jnp.clip((gx + 1.0) * 0.5 * (w - 1), 0.0, w - 1)
    iy = jnp.clip((gy + 1.0) * 0.5 * (h - 1), 0.0, h - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    fx = ix - x0
    fy = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)

    flat = t.reshape(b, c, h * w)

    def gather(yi, xi):
        idx = (yi * w + xi).reshape(b, 1, hg * wg)
        return jnp.take_along_axis(flat, idx, axis=2).reshape(b, c, hg, wg)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)

    fx = fx[:, None].astype(t.dtype)
    fy = fy[:, None].astype(t.dtype)
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def sample(t: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Reference ``sample`` (``src/modules.py:822-825``): transpose the coord grid
    then grid_sample. coords: [B, S, S, 2] in [-1, 1]."""
    return grid_sample(t, jnp.transpose(coords, (0, 2, 1, 3)))


def super_perm(key: jax.Array, size: int) -> jnp.ndarray:
    """Random batch permutation avoiding (most) fixed points, as in the reference."""
    perm = jax.random.permutation(key, size)
    perm = jnp.where(perm == jnp.arange(size), perm + 1, perm)
    return perm % size


def random_coords(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform coords in [-1, 1] with torch ``torch.rand(shape)*2-1`` semantics."""
    return jax.random.uniform(key, shape, minval=-1.0, maxval=1.0)
