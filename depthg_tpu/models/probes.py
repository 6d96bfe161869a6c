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
