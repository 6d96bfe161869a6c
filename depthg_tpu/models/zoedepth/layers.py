"""Conv/deconv primitives for the ZoeDepth/DPT stack (NCHW, torch layouts)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_DN = ("NCHW", "OIHW", "NCHW")


def conv_init(key, in_ch, out_ch, k, dtype=jnp.float32, bias=True):
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k * k
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (out_ch, in_ch, k, k), dtype, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)
    return p


def conv2d(p, x, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)], dimension_numbers=_DN)
    if "b" in p:
        y = y + p["b"][None, :, None, None].astype(x.dtype)
    return y


def deconv_init(key, in_ch, out_ch, k, dtype=jnp.float32):
    """torch ConvTranspose2d(in, out, k, stride=k) — weight [in, out, k, k]."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch  # torch uses in_ch * k*k / (k*k) groups... keep simple default
    bound = 1.0 / math.sqrt(in_ch * k * k)
    return {"w": jax.random.uniform(kw, (in_ch, out_ch, k, k), dtype, -bound, bound),
            "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound)}


def deconv_kxk(p, x):
    """ConvTranspose2d with stride == kernel: one einsum + pixel-shuffle."""
    in_ch, out_ch, k, _ = p["w"].shape
    b, c, h, w = x.shape
    y = jnp.einsum("bchw,codk->bohdwk", x, p["w"].astype(x.dtype)
                   ).reshape(b, out_ch, h * k, w * k)
    return y + p["b"][None, :, None, None].astype(x.dtype)


def mlp_conv(params_list, x, acts):
    """Sequential 1x1-conv MLP; acts: list of activation fns (None = identity)."""
    for p, act in zip(params_list, acts):
        x = conv2d(p, x)
        if act is not None:
            x = act(x)
    return x
