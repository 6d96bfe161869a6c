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


def cast_tree_bf16(tree):
    """Cast every f32 leaf to bf16 — the frozen-backbone reduced-precision
    cast shared by the ViT, depth-ViT and pyramid backbones."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        tree)


def quantize_linear_params(params: dict) -> dict:
    """Symmetric per-output-channel int8 weight quantization of a linear.

    Returns {w_q int8 [in, out], s_w f32 [out], b f32}; ``linear`` detects
    the ``w_q`` key and takes the w8a8 MXU path. Quantization is a pure
    trace-time transform of the f32 params (the frozen backbone re-derives
    it each call — ~21M weight elements, trivial next to the forwards)."""
    w = params["w"].astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    return {"w_q": jnp.round(w / s_w).astype(jnp.int8), "s_w": s_w,
            "b": params["b"].astype(jnp.float32)}


def _linear_w8a8(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """int8 x int8 -> int32 matmul (2x the MXU's bf16 peak) with dynamic
    per-token symmetric activation quantization; accumulates and rescales in
    f32, returns ``x.dtype``. All-zero rows (the ViT's padded tokens)
    quantize to exactly 0."""
    xf = x.astype(jnp.float32)
    s_x = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    x_q = jnp.round(xf / s_x).astype(jnp.int8)
    y = jax.lax.dot_general(x_q, params["w_q"],
                            (((x_q.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (s_x * params["s_w"])
            + params["b"]).astype(x.dtype)


def linear(params, x):
    if "w_q" in params:
        return _linear_w8a8(params, x)
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
