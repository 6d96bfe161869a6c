"""Feature-correlation primitives — the heart of the STEGO/DepthG loss.

``tensor_correlation`` computes all-pairs inner products between two sampled
feature grids (reference ``src/modules.py:797-809``). On TPU it is expressed as
one batched matmul [B, S*S, C] x [B, C, S*S] so the MXU does the work; the 5-D
view the reference exposes is just a reshape.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def norm(t: jnp.ndarray, axis: int = 1, eps: float = 1e-10) -> jnp.ndarray:
    """torch ``F.normalize(t, dim=1, eps=1e-10)``: divide by max(norm, eps)."""
    n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=axis, keepdims=True))
    return (t / jnp.maximum(n, eps)).astype(t.dtype)


def tensor_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """einsum("nchw,ncij->nhwij"): cosine-similarity tensor between two grids.

    a: [B, C, H, W], b: [B, C, I, J] -> [B, H, W, I, J]
    """
    bsz, c, h, w = a.shape
    _, _, i, j = b.shape
    af = a.reshape(bsz, c, h * w)
    bf = b.reshape(bsz, c, i * j)
    # [B, S*S, S*S] batched matmul: small contraction (C<=768), f32 accumulation
    # keeps the loss surface identical to the f32 torch reference
    out = jnp.einsum("bcm,bcn->bmn", af, bf,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(bsz, h, w, i, j).astype(a.dtype)


def depth_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Same contraction with C=1 (depth maps), reference ``src/modules.py:812-814``."""
    return tensor_correlation(a, b)


def average_norm(t: jnp.ndarray) -> jnp.ndarray:
    """Reference ``average_norm`` (``src/modules.py:793-794``): divide by the
    mean channel-norm instead of per-position norms."""
    norms = jnp.sqrt(jnp.sum(jnp.square(t), axis=1, keepdims=True))
    return t / norms.mean()


def shuffle(key, x: jnp.ndarray) -> jnp.ndarray:
    """Reference ``shuffle`` (``src/utils.py:45-47``) with an explicit key."""
    return x[jax.random.permutation(key, x.shape[0])]


def one_hot_feats(labels: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """Reference ``one_hot_feats`` (``src/utils.py:64-65``): [B,H,W] int ->
    [B,C,H,W] float one-hot."""
    return jax.nn.one_hot(labels, n_classes, axis=1, dtype=jnp.float32)
