"""Image resampling with exact PyTorch ``F.interpolate`` / adaptive-pool semantics.

TPU-first design note: instead of per-pixel gathers, 1-D resampling is encoded
as small dense weight matrices built once per (in_size, out_size) pair at trace
time, so a 2-D resize becomes two matmuls that XLA tiles onto the MXU and fuses
with neighbors. For the sizes this framework uses (<=640) the matrices are tiny.

Semantics mirrored from the reference:
  * bilinear align_corners=False — probe/logit upsampling
    (reference ``src/train_segmentation.py:431``, ``src/eval_segmentation.py:156``)
  * bilinear align_corners=True  — depth upsampling in the depth-feature
    correlation loss (reference ``src/modules.py:1261-1262``)
  * bicubic (align_corners=False, optional explicit scale) — DINO positional
    embedding interpolation (reference ``src/dino/vision_transformer.py:192-196``)
  * adaptive_avg_pool2d / adaptive_max_pool2d — depth downscaling for FPS and
    simple sampling (reference ``src/modules.py:1003``, ``src/modules.py:830``)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """[out, in] row-stochastic interpolation matrix matching torch bilinear."""
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = max(src, 0.0)  # torch clamps negatives for linear
        i0 = min(int(np.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        w1 = src - i0
        mat[i, i0] += 1.0 - w1
        mat[i, i1] += w1
    return mat


def _cubic_weight(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), the torch bicubic kernel with A=-0.75."""
    x = np.abs(x)
    out = np.zeros_like(x)
    m1 = x <= 1.0
    m2 = (x > 1.0) & (x < 2.0)
    out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
    out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
    return out


@functools.lru_cache(maxsize=None)
def _cubic_matrix(in_size: int, out_size: int, scale: float | None) -> np.ndarray:
    """[out, in] bicubic matrix, torch semantics (align_corners=False).

    ``scale`` is the explicit torch ``scale_factor`` if one was passed to
    ``F.interpolate`` (source index uses 1/scale rather than in/out).
    """
    mat = np.zeros((out_size, in_size), np.float32)
    step = (1.0 / scale) if scale is not None else in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * step - 0.5  # no clamping for cubic
        i0 = int(np.floor(src))
        frac = src - i0
        taps = np.array([i0 - 1, i0, i0 + 1, i0 + 2])
        weights = _cubic_weight(np.array([frac + 1.0, frac, 1.0 - frac, 2.0 - frac]))
        for t, w in zip(taps, weights):
            mat[i, int(np.clip(t, 0, in_size - 1))] += w
    return mat


def _apply_separable(x: jnp.ndarray, mat_h: np.ndarray, mat_w: np.ndarray,
                     fast: bool = False) -> jnp.ndarray:
    """Apply [OH,H] and [OW,W] matrices over the last two axes of x [..., H, W].

    Default: f32 math at Precision.HIGHEST — the matrices are tiny, full
    precision costs nothing at trace boundaries and keeps bit-level parity
    with the torch reference resampling. ``fast=True`` keeps the input dtype
    and the MXU's default precision — only for throughput-critical inner
    loops whose values live in [0, 1] (e.g. the CRF mean-field state, where
    each iteration re-softmaxes from the f32 unary so rounding cannot
    accumulate; fidelity validated in docs/CRF_FIDELITY.md).
    """
    wh = jnp.asarray(mat_h)
    ww = jnp.asarray(mat_w)
    dtype = x.dtype
    if fast:
        wh, ww = wh.astype(dtype), ww.astype(dtype)
        prec = None
    else:
        x = x.astype(jnp.float32)
        prec = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,...hw->...ow", wh, x, precision=prec)
    x = jnp.einsum("pw,...ow->...op", ww, x, precision=prec)
    return x.astype(dtype)


def resize_bilinear(x: jnp.ndarray, size, align_corners: bool = False,
                    fast: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(x, size, mode='bilinear', align_corners=...)`` for [..., H, W]."""
    oh, ow = (size, size) if isinstance(size, int) else size
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _linear_matrix(h, oh, align_corners),
                            _linear_matrix(w, ow, align_corners), fast=fast)


def resize_bicubic(x: jnp.ndarray, size, scale: tuple | None = None) -> jnp.ndarray:
    """torch bicubic resize (align_corners=False). ``scale`` = explicit scale_factor pair."""
    oh, ow = (size, size) if isinstance(size, int) else size
    h, w = x.shape[-2], x.shape[-1]
    sh, sw = (scale if scale is not None else (None, None))
    return _apply_separable(x, _cubic_matrix(h, oh, sh), _cubic_matrix(w, ow, sw))


@functools.lru_cache(maxsize=None)
def _quad_linear_matrices(in_size: int, out_size: int, align_corners: bool):
    """[out, in] matrices (A2, AB) for the exact squared-norm of a bilinear
    resize (see ``resized_sq_norm``): each output row u of the bilinear
    matrix has two taps (i0, i1 = min(i0+1, in-1)) with weights (a, b), so
    resize(y)_u^2 = a^2 y_{i0}^2 + b^2 y_{i1}^2 + 2ab y_{i0} y_{i1}
                  = (A2 @ g0)_u + (AB @ g1)_u
    with g0_j = y_j^2 and g1_j = y_j * y_{min(j+1, in-1)} (the clamped shift
    matches i1's clamp, so the identity holds at the edge rows too)."""
    a2 = np.zeros((out_size, in_size), np.float32)
    ab = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        if align_corners:
            src = i * (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        else:
            src = (i + 0.5) * in_size / out_size - 0.5
            src = max(src, 0.0)
        i0 = min(int(np.floor(src)), in_size - 1)
        i1 = min(i0 + 1, in_size - 1)
        w1 = src - i0
        a, b = 1.0 - w1, w1
        a2[i, i0] += a * a
        a2[i, i1] += b * b
        ab[i, i0] += 2.0 * a * b
    return a2, ab


def resized_sq_norm(x: jnp.ndarray, size, align_corners: bool = False) -> jnp.ndarray:
    """Channel-summed squares of a bilinear resize, without materializing it.

    x: [B, C, H, W] -> [B, OH, OW] equal (in exact arithmetic) to
    ``(resize_bilinear(x, size) ** 2).sum(axis=1)``. The W axis is resized
    exactly (it is linear), then the H-axis square expands through the
    2-tap bilinear rows via ``_quad_linear_matrices`` — so the O(C*OH*OW)
    resized tensor never exists. Built for ``cluster_lookup_resized``: the
    eval path's cosine-similarity denominator |resize(code)| is the only
    thing that stops the probes from commuting with the upsample."""
    oh, ow = (size, size) if isinstance(size, int) else size
    h, w = x.shape[-2], x.shape[-1]
    x = x.astype(jnp.float32)
    prec = jax.lax.Precision.HIGHEST
    if (h, w) == (oh, ow):
        return jnp.sum(x * x, axis=1)
    y = jnp.einsum("bchw,vw->bchv", x,
                   jnp.asarray(_linear_matrix(w, ow, align_corners)),
                   precision=prec)  # exact W-resize, still at H rows
    y_next = jnp.concatenate([y[:, :, 1:, :], y[:, :, -1:, :]], axis=2)
    g0 = jnp.einsum("bchv,bchv->bhv", y, y, precision=prec)
    g1 = jnp.einsum("bchv,bchv->bhv", y, y_next, precision=prec)
    a2, ab = _quad_linear_matrices(h, oh, align_corners)
    s = (jnp.einsum("uh,bhv->buv", jnp.asarray(a2), g0, precision=prec)
         + jnp.einsum("uh,bhv->buv", jnp.asarray(ab), g1, precision=prec))
    return jnp.maximum(s, 0.0)  # rounding can leave tiny negatives


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix matching torch adaptive_avg_pool1d bins."""
    mat = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil
        mat[i, start:end] = 1.0 / (end - start)
    return mat


def adaptive_avg_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch ``F.adaptive_avg_pool2d`` for [..., H, W]."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (oh, ow):
        return x
    return _apply_separable(x, _adaptive_avg_matrix(h, oh), _adaptive_avg_matrix(w, ow))


@functools.lru_cache(maxsize=None)
def _adaptive_bins(in_size: int, out_size: int):
    """Per-output gather indices [out, L] and validity mask for adaptive max bins."""
    starts = [(i * in_size) // out_size for i in range(out_size)]
    ends = [-((-(i + 1) * in_size) // out_size) for i in range(out_size)]
    longest = max(e - s for s, e in zip(starts, ends))
    idx = np.zeros((out_size, longest), np.int32)
    valid = np.zeros((out_size, longest), bool)
    for i, (s, e) in enumerate(zip(starts, ends)):
        n = e - s
        idx[i, :n] = np.arange(s, e)
        valid[i, :n] = True
    return idx, valid


def adaptive_max_pool2d(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch ``F.adaptive_max_pool2d`` for [..., H, W] (values only)."""
    oh, ow = (out_hw, out_hw) if isinstance(out_hw, int) else out_hw
    h, w = x.shape[-2], x.shape[-1]

    idx_h, valid_h = _adaptive_bins(h, oh)
    gathered = jnp.take(x, jnp.asarray(idx_h.reshape(-1)), axis=-2)
    gathered = gathered.reshape(x.shape[:-2] + (oh, idx_h.shape[1], w))
    neg = jnp.asarray(-jnp.inf, dtype=x.dtype)
    gathered = jnp.where(jnp.asarray(valid_h)[..., None], gathered, neg)
    x = jnp.max(gathered, axis=-2)

    idx_w, valid_w = _adaptive_bins(w, ow)
    gathered = jnp.take(x, jnp.asarray(idx_w.reshape(-1)), axis=-1)
    gathered = gathered.reshape(x.shape[:-2] + (oh, ow, idx_w.shape[1]))
    gathered = jnp.where(jnp.asarray(valid_w), gathered, neg)
    return jnp.max(gathered, axis=-1)
