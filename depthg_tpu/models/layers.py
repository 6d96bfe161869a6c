"""Minimal functional NN layer helpers: param pytrees + pure apply functions.

Design stance (SURVEY.md §7): no module framework — params are plain nested
dicts so torch-checkpoint conversion is a key-mapping exercise and every apply
is a pure jittable function. Linear weights are stored **[in, out]** (matmul
layout); converters transpose from torch's [out, in].

Initializers replicate torch defaults where the reference trains layers from
random init (Conv2d/Linear kaiming-uniform a=sqrt(5), uniform bias), since
initialization scale shapes the probe/projection training dynamics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(in), 1/sqrt(in))."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    return {
        "w": jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype, -bound, bound),
    }


def trunc_normal_init(key: jax.Array, shape, std: float = 0.02, dtype=jnp.float32):
    """torch trunc_normal_(std=.02) truncated at +-2 (pre-scaling), as used by ViT."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def vit_linear_init(key: jax.Array, in_dim: int, out_dim: int, dtype=jnp.float32):
    """ViT _init_weights: trunc_normal(std=.02) weight, zero bias."""
    return {
        "w": trunc_normal_init(key, (in_dim, out_dim), dtype=dtype),
        "b": jnp.zeros((out_dim,), dtype),
    }


def layer_norm_init(dim: int, dtype=jnp.float32):
    return {"g": jnp.ones((dim,), dtype), "b": jnp.zeros((dim,), dtype)}


def linear(params, x):
    return x @ params["w"] + params["b"]


def layer_norm(params, x, eps: float):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * params["g"] + params["b"]).astype(x.dtype)


def conv1x1_init(key: jax.Array, in_ch: int, out_ch: int, dtype=jnp.float32):
    """torch nn.Conv2d(in, out, (1,1)) default init; stored as [in, out] matmul."""
    return torch_linear_init(key, in_ch, out_ch, dtype)


def conv1x1(params, x):
    """1x1 conv on [B, C, H, W] as a channel matmul (MXU-friendly)."""
    y = jnp.einsum("bchw,cd->bdhw", x, params["w"])
    return y + params["b"][None, :, None, None]


def dropout2d(key: jax.Array, x: jnp.ndarray, rate: float, enabled: bool) -> jnp.ndarray:
    """torch nn.Dropout2d: zero whole channels of [B, C, H, W], scale by 1/(1-p)."""
    if not enabled or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape[:2])
    return x * keep[:, :, None, None].astype(x.dtype) / (1.0 - rate)


def dropout(key: jax.Array, x: jnp.ndarray, rate: float, enabled: bool) -> jnp.ndarray:
    if not enabled or rate == 0.0:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return x * keep.astype(x.dtype) / (1.0 - rate)
