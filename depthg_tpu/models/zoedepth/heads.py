"""ZoeDepth metric-bins head: seed bins, attractor refinement, log-binomial.

Functional port of the reference layer modules:
* SeedBinRegressor(+Unnormed) / Projector — ``src/zoedepth/models/layers/localbins_layers.py``
* AttractorLayer(+Unnormed) with exp/inv attractors — ``.../attractor.py``
* LogBinomial / ConditionalLogBinomial — ``.../dist_layers.py``
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from depthg_tpu.models.zoedepth.layers import conv2d, conv_init
from depthg_tpu.ops.resize import resize_bilinear


def mlp2_init(key, in_ch, mid, out_ch, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return [conv_init(k1, in_ch, mid, 1, dtype), conv_init(k2, mid, out_ch, 1, dtype)]


def seed_bin_regressor_normed(p, x, min_depth, max_depth):
    b = jax.nn.relu(conv2d(p[1], jax.nn.relu(conv2d(p[0], x)))) + 1e-3
    widths_normed = b / b.sum(axis=1, keepdims=True)
    widths = (max_depth - min_depth) * widths_normed
    widths = jnp.pad(widths, ((0, 0), (1, 0), (0, 0), (0, 0)),
                     constant_values=min_depth)
    edges = jnp.cumsum(widths, axis=1)
    centers = 0.5 * (edges[:, :-1] + edges[:, 1:])
    return widths_normed, centers


def seed_bin_regressor_softplus(p, x):
    centers = jax.nn.softplus(conv2d(p[1], jax.nn.relu(conv2d(p[0], x))))
    return centers, centers


def projector(p, x):
    return conv2d(p[1], jax.nn.relu(conv2d(p[0], x)))


def exp_attractor(dx, alpha, gamma):
    return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx


def inv_attractor(dx, alpha, gamma):
    return dx / (1 + alpha * dx ** gamma)


def attractor_softplus(p, x, b_prev, prev_b_embedding, *, alpha, gamma, kind,
                       attractor_type):
    """AttractorLayerUnnormed forward (``attractor.py:164-211``).

    Reference quirk preserved: the layer calls its jit-scripted
    ``exp_attractor``/``inv_attractor`` WITHOUT passing ``self.alpha``/
    ``self.gamma`` (``attractor.py:193-196``), so the script defaults
    (alpha=300, gamma=2) always apply and the configured attractor_alpha
    (1000 in the ZoeDepth config) is silently ignored. The ``alpha``/``gamma``
    arguments here are accepted for API parity but unused, like the torch
    module's attributes."""
    del alpha, gamma  # see docstring — the reference never uses them
    if prev_b_embedding is not None:
        prev_b_embedding = resize_bilinear(prev_b_embedding, x.shape[-2:],
                                           align_corners=True)
        x = x + prev_b_embedding
    a = jax.nn.softplus(conv2d(p[1], jax.nn.relu(conv2d(p[0], x))))
    b_centers = resize_bilinear(b_prev, a.shape[-2:], align_corners=True)
    dist = exp_attractor if attractor_type == "exp" else inv_attractor
    dx = a[:, :, None] - b_centers[:, None]  # [B, n_attr, n_bins, H, W]
    delta = dist(dx, 300.0, 2)
    delta = delta.mean(axis=1) if kind == "mean" else delta.sum(axis=1)
    b_new = b_centers + delta
    return b_new, b_new


def attractor_normed(p, x, b_prev, prev_b_embedding, *, alpha, gamma, kind,
                     attractor_type, min_depth, max_depth):
    """AttractorLayer forward (``attractor.py:85-136``) — bounded bin centers.

    Reference quirks preserved: ``A_normed`` is assigned the UNnormalized
    channel 0 (``attractor.py:107-108`` overwrites the normalized version),
    and the jit-scripted dist functions are called without alpha/gamma so the
    script defaults (300, 2) always apply (see ``attractor_softplus``).
    """
    del alpha, gamma
    if prev_b_embedding is not None:
        prev_b_embedding = resize_bilinear(prev_b_embedding, x.shape[-2:],
                                           align_corners=True)
        x = x + prev_b_embedding
    a = jax.nn.relu(conv2d(p[1], jax.nn.relu(conv2d(p[0], x)))) + 1e-3
    n, c, h, w = a.shape
    a = a.reshape(n, c // 2, 2, h, w)
    a_normed = a[:, :, 0]  # sic — the normalization result is discarded
    b_centers = resize_bilinear(b_prev, (h, w), align_corners=True)
    dist = exp_attractor if attractor_type == "exp" else inv_attractor
    dx = a_normed[:, :, None] - b_centers[:, None]
    delta = dist(dx, 300.0, 2)
    delta = delta.mean(axis=1) if kind == "mean" else delta.sum(axis=1)
    b_new = b_centers + delta
    centers = (max_depth - min_depth) * b_new + min_depth
    centers = jnp.sort(centers, axis=1)
    centers = jnp.clip(centers, min_depth, max_depth)
    return b_new, centers


def log_binomial(probs, t, n_classes, eps=1e-4):
    """LogBinomial forward (``dist_layers.py:36-69``)."""
    k = jnp.arange(n_classes, dtype=jnp.float32).reshape(1, -1, 1, 1)
    big_k = float(n_classes - 1)
    x = jnp.clip(probs, eps, 1.0)
    one_minus = jnp.clip(1.0 - probs, eps, 1.0)

    def log_binom(n, r, leps=1e-7):
        # the reference's stirling log-nCk uses its own eps=1e-7
        # (dist_layers.py log_binom default), independent of the clamp eps.
        # The log argument is clamped from below: XLA reassociates
        # (n+eps)-(r+eps)+eps and cancels the epsilon, turning log(eps) into
        # log(0) = -inf and the k = K-1 term into 0 * -inf = NaN under jit.
        # Since r <= n the clamp never changes the torch value.
        n = n + leps
        r = r + leps
        return (n * jnp.log(n) - r * jnp.log(r)
                - (n - r) * jnp.log(jnp.maximum(n - r + leps, leps)))

    y = log_binom(jnp.full_like(k, big_k), k) + k * jnp.log(x) \
        + (big_k - k) * jnp.log(one_minus)
    return jax.nn.softmax(y / t, axis=1)


def conditional_log_binomial(p, x, cond, n_classes, min_temp, max_temp, p_eps=1e-4):
    """ConditionalLogBinomial forward (``dist_layers.py:72-121``)."""
    pt = jax.nn.softplus(conv2d(p[1], jax.nn.gelu(
        conv2d(p[0], jnp.concatenate([x, cond], axis=1)), approximate=False)))
    prob, temp = pt[:, :2], pt[:, 2:]
    prob = prob + p_eps
    prob = prob[:, 0] / (prob[:, 0] + prob[:, 1])
    temp = temp + p_eps
    temp = temp[:, 0] / (temp[:, 0] + temp[:, 1])
    temp = (max_temp - min_temp) * temp[:, None] + min_temp
    return log_binomial(prob[:, None], temp, n_classes)
