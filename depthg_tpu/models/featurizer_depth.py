"""Depth-fused DINO featurizer (``arch=dino_depth``).

Behavioral port of reference ``DinoFeaturizerWithDepth``
(``src/modules.py:490-614``): a stride-2 conv pyramid embeds the depth map to
the backbone feature resolution; guidance in {"sum", "cross_attn", "none"}
fuses it with the frozen image features before the projection head. In eval
mode (no depth available) the cross-attention path queries with a learned
``no_depth_embed`` token.

TPU-first notes: every stride-2 k=2 conv is a space-to-depth reshape + one
GEMM (stride == kernel); cross-attention is standard batched attention on the
MXU. The reference's ``guidance="concat"`` branch is a latent bug (it leaves
the fused features undefined, ``src/modules.py:564-565``) — here it raises.
Note also that the reference's non-384 pyramid has FIVE stride-2 stages
(``src/modules.py:508-522``), i.e. a 32x downscale that does NOT match the
patch-8 feature grid — ``sum``/``cross_attn`` guidance only line up for
n_feats=384 backbones; preserved as-is.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from depthg_tpu.models import featurizer as base
from depthg_tpu.models.layers import conv1x1, dropout, linear, torch_linear_init


@dataclasses.dataclass(frozen=True)
class DepthFeaturizerConfig(base.FeaturizerConfig):
    guidance: str = "none"          # cfg.guidance: "cross_attn" | "sum" | "none"
    cross_attn_heads: int = 8
    cross_attn_dropout: float = 0.1


def _pyramid_channels(n_feats: int) -> list[int]:
    if n_feats == 384:
        return [1, 64, 128, 384]
    return [1, 64, 128, 256, 512, n_feats]


def conv2x2_init(key: jax.Array, in_ch: int, out_ch: int, dtype=jnp.float32) -> dict:
    """torch Conv2d(in, out, kernel_size=2, stride=2) default init, stored as
    [in*4, out] in (c, kh, kw) flatten order."""
    kw, kb = jax.random.split(key)
    fan_in = in_ch * 4
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "w": jax.random.uniform(kw, (fan_in, out_ch), dtype, -bound, bound),
        "b": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def conv2x2_s2(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """k=2 s=2 conv as space-to-depth + GEMM; x [B, C, H, W] -> [B, O, H/2, W/2]."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(b, (h // 2) * (w // 2), c * 4)
    y = x @ params["w"] + params["b"]
    return jnp.transpose(y, (0, 2, 1)).reshape(b, -1, h // 2, w // 2)


def layer_norm_2d(params: dict, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Channel-dim LayerNorm on [B, C, H, W] (reference ``LayerNorm2d``,
    ``src/modules.py:619-631``)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    return (params["g"][None, :, None, None] * y
            + params["b"][None, :, None, None]).astype(x.dtype)


def depth_featurizer_init(key: jax.Array, fcfg: DepthFeaturizerConfig,
                          dtype=jnp.float32) -> dict:
    params = base.featurizer_init(key, fcfg, dtype)
    nf = fcfg.n_feats
    chans = _pyramid_channels(nf)
    keys = iter(jax.random.split(jax.random.fold_in(key, 1), len(chans) + 3))

    pyramid = []
    for i in range(len(chans) - 1):
        stage = {"conv": conv2x2_init(next(keys), chans[i], chans[i + 1], dtype)}
        if i < len(chans) - 2:  # every stage but the last has LN (+GELU)
            stage["ln"] = {"g": jnp.ones((chans[i + 1],), dtype),
                           "b": jnp.zeros((chans[i + 1],), dtype)}
        pyramid.append(stage)
    params["depth_downscaling"] = pyramid

    kq = next(keys)
    params["cross_attn"] = {
        "in_proj": torch_linear_init(kq, nf, 3 * nf, dtype),
        "out_proj": torch_linear_init(next(keys), nf, nf, dtype),
    }
    params["no_depth_embed"] = jax.random.normal(next(keys), (1, nf), dtype)
    return params


def _multihead_attention(p: dict, q, k, v, num_heads: int, drop_rate: float,
                         key=None, train=False):
    """torch nn.MultiheadAttention forward (batch_first=False semantics are
    normalized away: inputs here are [B, N, D])."""
    b, nq, d = q.shape
    hd = d // num_heads
    w = p["in_proj"]["w"]  # [D, 3D]
    bias = p["in_proj"]["b"]
    wq, wk, wv = w[:, :d], w[:, d:2 * d], w[:, 2 * d:]
    bq, bk, bv = bias[:d], bias[d:2 * d], bias[2 * d:]
    qh = (q @ wq + bq).reshape(b, nq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = (k @ wk + bk).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    vh = (v @ wv + bv).reshape(b, -1, num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) / math.sqrt(hd)
    attn = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    if train and key is not None and drop_rate > 0:
        attn = dropout(key, attn, drop_rate, True)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, nq, d)
    return linear(p["out_proj"], out)


def depth_pyramid(params: dict, depth: jnp.ndarray) -> jnp.ndarray:
    x = depth
    stages = params["depth_downscaling"]
    for i, stage in enumerate(stages):
        x = conv2x2_s2(stage["conv"], x)
        if "ln" in stage:
            x = layer_norm_2d(stage["ln"], x)
            x = jax.nn.gelu(x, approximate=False)
    return x


def depth_featurizer_apply(params: dict, img: jnp.ndarray,
                           fcfg: DepthFeaturizerConfig,
                           depth: jnp.ndarray | None = None,
                           key: jax.Array | None = None, train: bool = False,
                           precision: str | None = None, need_attn: bool = False,
                           backbone_dtype: str | None = None):
    """Returns dict(feats=fused, code, orig_feats, attn) in train mode;
    eval mode omits orig_feats (mirrors ``src/modules.py:596-605``)."""
    image_feat, attn = base.backbone_features(params, img, fcfg, precision,
                                              need_attn, backbone_dtype)
    b, nf, fh, fw = image_feat.shape

    if key is not None:
        kd, kp, kf = jax.random.split(key, 3)
    else:
        kd = kp = kf = None

    if depth is None:
        depth = jnp.zeros((b, 1, fh * fcfg.patch_size, fw * fcfg.patch_size),
                          img.dtype)
        have_depth = False
    else:
        have_depth = True

    if fcfg.guidance == "concat":
        raise NotImplementedError(
            "guidance='concat' is a latent bug in the reference (fused feats "
            "left undefined, src/modules.py:564-565)")

    if train and fcfg.guidance == "sum":
        fused = image_feat + depth_pyramid(params, depth)
    elif fcfg.guidance == "cross_attn":
        img_tok = image_feat.reshape(b, nf, -1).transpose(0, 2, 1)  # [B, P, D]
        if train and have_depth:
            d_tok = depth_pyramid(params, depth).reshape(b, nf, -1).transpose(0, 2, 1)
        else:
            d_tok = jnp.broadcast_to(params["no_depth_embed"][None],
                                     (b, img_tok.shape[1], nf)).astype(img_tok.dtype)
        fused = _multihead_attention(params["cross_attn"], d_tok, img_tok, img_tok,
                                     fcfg.cross_attn_heads, fcfg.cross_attn_dropout,
                                     kd, train)
        fused = fused.transpose(0, 2, 1).reshape(b, nf, fh, fw)
    else:
        fused = image_feat

    from depthg_tpu.models.layers import dropout2d

    code = base.project(params, fused, fcfg, kp, train)
    feats_out = fused
    if fcfg.dropout:
        feats_out = dropout2d(kf, fused, fcfg.drop_rate, train and kf is not None)
    out = {"feats": feats_out, "code": code, "attn": attn}
    if train:
        out["orig_feats"] = image_feat
    return out
