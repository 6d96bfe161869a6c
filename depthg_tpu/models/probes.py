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
                         log_probs: bool = False):
    """x: [B, dim, H, W]. Returns (loss, probs) or log-softmax probabilities."""
    clusters = norm(params["clusters"], axis=1)
    feats = norm(x, axis=1)
    ip = jnp.einsum("bchw,nc->bnhw", feats, clusters,
                    precision=jax.lax.Precision.HIGHEST)
    if log_probs:
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


def linear_probe_init(key: jax.Array, dim: int, n_classes: int, dtype=jnp.float32) -> dict:
    return conv1x1_init(key, dim, n_classes, dtype)


def linear_probe_apply(params: dict, x: jnp.ndarray) -> jnp.ndarray:
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
