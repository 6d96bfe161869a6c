"""Cluster / linear probes and the reconstruction decoder.

Spec from the reference:
* ``ClusterLookup`` (``src/modules.py:647-675``): learned centroids; cosine
  inner products; one-hot argmax when alpha is None else softmax(ip*alpha);
  cluster loss = -(probs * ip).sum(1).mean(); ``log_probs`` variant used by
  the CRF eval path.
* linear probe: 1x1 conv dim -> n_classes (``src/train_segmentation.py:113``).
* decoder: 1x1 conv dim -> n_feats for the (default-off) reconstruction loss
  (``src/train_segmentation.py:115``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthg_tpu.models.layers import conv1x1, conv1x1_init
from depthg_tpu.ops.correlation import norm


def cluster_lookup_init(key: jax.Array, dim: int, n_classes: int, dtype=jnp.float32) -> dict:
    return {"clusters": jax.random.normal(key, (n_classes, dim), dtype)}


def cluster_lookup_apply(params: dict, x: jnp.ndarray, alpha: float | None,
                         log_probs: bool = False, normalized: bool = True):
    """x: [B, dim, H, W]. Returns (loss, probs) or log-softmax probabilities.

    ``normalized=False`` (log_probs mode only) returns the raw ``ip * alpha``
    logits — shift-equivalent to the log-probs for softmax/argmax consumers,
    skipping one full-resolution normalization pass."""
    clusters = norm(params["clusters"], axis=1)
    feats = norm(x, axis=1)
    ip = jnp.einsum("bchw,nc->bnhw", feats, clusters,
                    precision=jax.lax.Precision.HIGHEST)
    if log_probs:
        if not normalized:
            return ip * alpha
        return jax.nn.log_softmax(ip * alpha, axis=1)
    if alpha is None:
        probs = jax.nn.one_hot(jnp.argmax(ip, axis=1), clusters.shape[0],
                               axis=1, dtype=jnp.float32)
        # argmax selection is non-differentiable: match torch, no gradient to probs
        probs = jax.lax.stop_gradient(probs)
    else:
        probs = jax.nn.softmax(ip * alpha, axis=1)
    loss = -jnp.mean(jnp.sum(probs * ip, axis=1))
    return loss, probs


def cluster_lookup_resized(params: dict, x: jnp.ndarray, size,
                           alpha: float, normalized: bool = True) -> jnp.ndarray:
    """log-prob cluster lookup of the bilinearly-RESIZED code, computed from
    the low-resolution code — exact restructuring of
    ``cluster_lookup_apply(params, resize_bilinear(x, size), alpha,
    log_probs=True)`` (the eval path, reference
    ``src/eval_segmentation.py:156-159``) that never materializes the
    resized [B, dim, R, R] code (917 MB at batch 16 / dim 70 / R 320):

    * numerator: resize commutes with the channel-linear cluster dots, so
      the [B, n, h, w] dots resize instead of the [B, dim, h, w] code;
    * denominator: |resize(code)| per pixel via ``resized_sq_norm``'s exact
      quadratic expansion of the 2-tap bilinear rows.

    torch ``F.normalize`` divides by max(|v|, eps) per factor; the cluster
    rows are normalized exactly as in ``cluster_lookup_apply`` and the code
    norm moves outside the dot: (r / max(|r|, eps)) . c == (r . c) /
    max(|r|, eps)."""
    from depthg_tpu.ops.resize import resize_bilinear, resized_sq_norm

    clusters = norm(params["clusters"], axis=1)
    dots = jnp.einsum("bchw,nc->bnhw", x.astype(jnp.float32), clusters,
                      precision=jax.lax.Precision.HIGHEST)
    dots_r = resize_bilinear(dots, size)
    code_norm = jnp.sqrt(resized_sq_norm(x, size))  # [B, R, R]
    ip = dots_r / jnp.maximum(code_norm[:, None], 1e-10)
    if not normalized:
        return ip * alpha
    return jax.nn.log_softmax(ip * alpha, axis=1)


def linear_probe_init(key: jax.Array, dim: int, n_classes: int, dtype=jnp.float32) -> dict:
    return conv1x1_init(key, dim, n_classes, dtype)


def linear_probe_apply(params: dict, x: jnp.ndarray,
                       precision=None) -> jnp.ndarray:
    """1x1-conv classifier. ``precision``: the eval lowres path pins HIGHEST —
    at code resolution the conv is 64x cheaper than the reference's
    resized-code conv, so full precision is free and keeps the upsampled
    logits closer to the f32 math than the materializing path's
    default-precision conv (verified on TPU, tests/test_inference_lowres)."""
    if precision is not None:
        y = jnp.einsum("bchw,cd->bdhw", x, params["w"], precision=precision)
        return y + params["b"][None, :, None, None]
    return conv1x1(params, x)


def decoder_init(key: jax.Array, dim: int, n_feats: int, dtype=jnp.float32) -> dict:
    return conv1x1_init(key, dim, n_feats, dtype)


def decoder_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return conv1x1(params, x)


def full_decoder_init(key: jax.Array, code_ch: int, feat_ch: int, dtype=jnp.float32) -> dict:
    """The reference's standalone ``Decoder`` module (``src/modules.py:1474-1486``):
    a linear 1x1 conv plus a conv-relu-conv-relu-conv branch, summed."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "linear": conv1x1_init(k1, code_ch, feat_ch, dtype),
        "nl1": conv1x1_init(k2, code_ch, code_ch, dtype),
        "nl2": conv1x1_init(k3, code_ch, code_ch, dtype),
        "nl3": conv1x1_init(k4, code_ch, feat_ch, dtype),
    }


def full_decoder_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    lin = conv1x1(params["linear"], x)
    h = jax.nn.relu(conv1x1(params["nl1"], x))
    h = jax.nn.relu(conv1x1(params["nl2"], h))
    return lin + conv1x1(params["nl3"], h)


def resize_and_classify(params: dict, x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reference ``ResizeAndClassify`` (``src/modules.py:634-644``):
    1x1-conv predictor -> log-softmax -> bilinear upsample."""
    from depthg_tpu.ops.resize import resize_bilinear

    logits = jax.nn.log_softmax(conv1x1(params, x), axis=1)
    return resize_bilinear(logits, size)
