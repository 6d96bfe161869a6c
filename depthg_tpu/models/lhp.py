"""Local Hidden Positive (LHP) projection modules.

Behavioral port of reference ``LocalHiddenPositiveProjection`` and
``OriginalLocalHiddenPositiveProjection`` (``src/modules.py:140-487``): build a
per-pixel affinity over the patch grid from either (a) depth point-cloud
distances or (b) mean ViT attention, threshold it to local neighbors, mix the
code by the affinity, then run a conv-relu-conv projection head.

TPU-first: the reference's per-image python loops over the batch
(``src/modules.py:293-300, 326-331``) become batched [B, P, P] x [B, P, C]
matmuls on the MXU; cdist is the usual |a|^2+|b|^2-2ab expansion.

Reference quirks preserved:
* the "Original" variants divide by ``divide_num`` which is *all zeros*
  (``src/modules.py:184, 424, 480``) — float division by zero yields +-inf,
  exactly as in torch; these paths exist for parity, not for use;
* ``forward_depth`` zeroes affinities where the normalized distance exceeds
  the 1%-quantile (non-original) or the mean (original), computed per row.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.models.layers import conv1x1, conv1x1_init
from depthg_tpu.ops.depth import depth2points
from depthg_tpu.ops.resize import adaptive_avg_pool2d


@dataclasses.dataclass(frozen=True)
class LHPConfig:
    dim: int = 70
    res: int = 224
    patch_size: int = 8
    propagation_strategy: str = "depth"  # "depth" | "attn"
    original: bool = False

    @property
    def grid(self) -> int:
        return self.res // self.patch_size


def lhp_init(key: jax.Array, cfg: LHPConfig, dtype=jnp.float32) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "proj": {
            "fc1": conv1x1_init(k1, cfg.dim, cfg.dim, dtype),
            "fc2": conv1x1_init(k2, cfg.dim, cfg.dim, dtype),
        }
    }


@functools.lru_cache(maxsize=None)
def neighborhood_mask(sz: int) -> np.ndarray:
    """[sz*sz, sz*sz] 3x3-neighborhood adjacency (incl. self), matching the
    reference's hand-rolled index_set construction (``src/modules.py:159-183``)."""
    mask = np.zeros((sz * sz, sz * sz), np.float32)
    for r in range(sz):
        for c in range(sz):
            i = r * sz + c
            for dr in (-1, 0, 1):
                for dc in (-1, 0, 1):
                    rr, cc = r + dr, c + dc
                    if 0 <= rr < sz and 0 <= cc < sz:
                        mask[i, rr * sz + cc] = 1.0
    return mask


def _project(params, mixed):
    h = conv1x1(params["proj"]["fc1"], mixed)
    return conv1x1(params["proj"]["fc2"], jax.nn.relu(h))


def _pairwise_sq_dists(points: jnp.ndarray) -> jnp.ndarray:
    """points [B, P, D] -> [B, P, P] euclidean distances."""
    sq = jnp.sum(points * points, axis=-1)
    # |a|^2+|b|^2-2ab cancellation: the cross term must be exact f32 — at
    # the MXU default the bf16-rounded inputs perturb distances ~1.5%,
    # enough to flip near-threshold affinities on TPU while the CPU-run
    # golden tests stay blind (same failure class as the ops/crf.py
    # bilateral kernel bug; docs/CRF_FIDELITY.md "History"). Depth-3
    # contraction: HIGHEST is free.
    cross = jnp.einsum("bpd,bqd->bpq", points, points,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    d2 = jnp.maximum(sq[:, :, None] + sq[:, None, :] - 2 * cross, 0.0)
    return jnp.sqrt(d2)


def _depth_affinity(depth: jnp.ndarray, hw: tuple, original: bool) -> jnp.ndarray:
    """[B, 1, H, W] depth -> [B, P, P] thresholded local affinity map."""
    d = adaptive_avg_pool2d(depth, hw)[:, 0]
    clouds = jax.vmap(lambda dm: jnp.transpose(
        depth2points(dm, fov=90.0), (1, 2, 0)).reshape(-1, 3))(d)
    dist = _pairwise_sq_dists(clouds)

    lo = jnp.min(dist, axis=2, keepdims=True)
    hi = jnp.max(dist, axis=2, keepdims=True)
    normed = (dist - lo) / (hi - lo)
    negative = 1.0 - normed
    if original:
        thresh = jnp.mean(normed, axis=2, keepdims=True)
    else:
        thresh = jnp.quantile(normed, 0.01, axis=2, keepdims=True)
    return jnp.where(normed > thresh, 0.0, negative)


def _attn_affinity(attn: jnp.ndarray, original: bool) -> jnp.ndarray:
    """[B, h, N+1, N+1] attention -> [B, P, P] affinity."""
    a = jnp.mean(attn[:, :, 1:, 1:], axis=1).astype(jnp.float32)
    if original:
        hi = jnp.quantile(a, 0.9, axis=2, keepdims=True)
        lo = jnp.quantile(a, 0.1, axis=2, keepdims=True)
        a = (a - lo) / (hi - lo)
        a = jnp.where(a < jnp.mean(a, axis=2, keepdims=True), 0.0, a)
    else:
        lo = jnp.min(a, axis=2, keepdims=True)
        hi = jnp.max(a, axis=2, keepdims=True)
        a = (a - lo) / (hi - lo)
        cap = jnp.quantile(a, 0.99, axis=2, keepdims=True)
        a = jnp.where(a > cap, 0.0, a)
    return a


def lhp_apply(params: dict, cfg: LHPConfig, code: jnp.ndarray,
              depth: jnp.ndarray | None = None, img=None,
              attn: jnp.ndarray | None = None) -> jnp.ndarray:
    """code [B, C, H, W] -> projected code, reference ``forward`` dispatch
    (``src/modules.py:190-199``): missing inputs -> projection only.

    The reference's condition is ``depth is None or attn is None``, but its
    trainer ALWAYS passes a real attn (torch modules return it
    unconditionally), so attn-presence only ever gates the "attn" strategy
    in practice. Here attn may legitimately be None because the flash
    backbone never materializes the [N, N] matrix — requiring it for the
    "depth" strategy (which never reads its values) would force the O(N^2)
    einsum path for nothing, so the guard is strategy-aware. Behaviorally
    identical to the reference on every input it can produce.
    """
    if depth is None or (cfg.propagation_strategy == "attn" and attn is None):
        return _project(params, code)

    b, c, h, w = code.shape
    code_flat = code.reshape(b, c, h * w).transpose(0, 2, 1)  # [B, P, C]

    if cfg.propagation_strategy == "depth":
        aff = _depth_affinity(depth, (h, w), cfg.original)
    elif cfg.propagation_strategy == "attn":
        aff = _attn_affinity(attn, cfg.original)
    else:
        raise ValueError(f"Unknown propagation strategy: {cfg.propagation_strategy}")

    if cfg.original:
        aff = aff * jnp.asarray(neighborhood_mask(h))[None]
        mixed = jnp.einsum("bpq,bqc->bpc", aff, code_flat,
                           preferred_element_type=jnp.float32)
        # reference divides by an all-zeros divide_num -> inf, preserved
        mixed = mixed / jnp.zeros((h * w, 1), mixed.dtype)
    else:
        mixed = jnp.einsum("bpq,bqc->bpc", aff, code_flat,
                           preferred_element_type=jnp.float32) / (h * w)

    mixed = mixed.transpose(0, 2, 1).reshape(b, c, h, w).astype(code.dtype)
    return _project(params, mixed)
