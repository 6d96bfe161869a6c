"""ZoeDepth (single metric head) — full inference pipeline in JAX.

Composition per the reference (``src/zoedepth/models/zoedepth/zoedepth_v1.py``
with the "infer" config ``config_zoedepth.json``): BEiT-L/384 encoder -> DPT
decoder -> bottleneck conv -> softplus seed bins -> 4 inverse-attractor
refinement stages over the decoder scales -> conditional log-binomial over 64
bins -> depth = sum p*c. Inference adds reflect-pad + horizontal-flip TTA
(``src/zoedepth/models/depth_model.py:58-129``) and the MiDaS prep resize
(keep-aspect, multiple-of-32, "minimal" method, 0.5/0.5 normalization —
``src/zoedepth/models/base_models/midas.py:170-186``).

The prep resize target is computed host-side per input shape (static under
jit); variable image sizes therefore select jit buckets.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.models.zoedepth import heads
from depthg_tpu.models.zoedepth.beit import BEiTConfig, beit_forward, beit_init
from depthg_tpu.models.zoedepth.dpt import DPTConfig, dpt_forward, dpt_init
from depthg_tpu.models.zoedepth.layers import conv2d, conv_init
from depthg_tpu.ops.resize import resize_bicubic, resize_bilinear


@dataclasses.dataclass(frozen=True)
class ZoeConfig:
    n_bins: int = 64
    bin_embedding_dim: int = 128
    bin_centers_type: str = "softplus"
    min_depth: float = 1e-3
    max_depth: float = 10.0
    n_attractors: tuple = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: float = 2.0
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    inverse_midas: bool = False
    img_size: tuple = (384, 512)
    beit: BEiTConfig = BEiTConfig()
    dpt: DPTConfig = DPTConfig()
    n_midas_out: int = 32


def zoedepth_init(key: jax.Array, cfg: ZoeConfig, dtype=jnp.float32) -> dict:
    kb, kd, k1, k2, k3, k4, k5 = jax.random.split(key, 7)
    btlnck = cfg.dpt.features
    params = {
        "beit": beit_init(kb, cfg.beit, dtype),
        "dpt": dpt_init(kd, cfg.dpt, dtype),
        "conv2": conv_init(k1, btlnck, btlnck, 1, dtype),
        "seed_bin_regressor": heads.mlp2_init(k2, btlnck, 256, cfg.n_bins, dtype),
        "seed_projector": heads.mlp2_init(k3, btlnck, 128, cfg.bin_embedding_dim, dtype),
        "projectors": [], "attractors": [],
    }
    for i, n_attr in enumerate(cfg.n_attractors):
        kp, ka, k4 = jax.random.split(k4, 3)
        params["projectors"].append(
            heads.mlp2_init(kp, cfg.dpt.features, 128, cfg.bin_embedding_dim, dtype))
        out_ch = n_attr * 2 if cfg.bin_centers_type in ("normed", "hybrid2") else n_attr
        params["attractors"].append(
            heads.mlp2_init(ka, cfg.bin_embedding_dim, 128, out_ch, dtype))
    last_in = cfg.n_midas_out + 1
    bottleneck = (last_in + cfg.bin_embedding_dim) // 2
    kc1, kc2 = jax.random.split(k5)
    params["conditional_log_binomial"] = [
        conv_init(kc1, last_in + cfg.bin_embedding_dim, bottleneck, 1, dtype),
        conv_init(kc2, bottleneck, 4, 1, dtype),
    ]
    return params


def zoedepth_forward(params: dict, x: jnp.ndarray, cfg: ZoeConfig,
                     return_probs: bool = False) -> dict:
    """x: prep-normalized [B, 3, H, W], H/W multiples of 32.

    Returns dict(rel_depth, metric_depth [B,1,H,W], feats=bin embedding).
    """
    taps, grid = beit_forward(params["beit"], x, cfg.beit)
    rel_depth, hooks = dpt_forward(params["dpt"], taps, grid, cfg.dpt)

    btlnck = conv2d(params["conv2"], hooks["l4_rn"])
    xh = btlnck
    if cfg.bin_centers_type == "softplus":
        _, seed_centers = heads.seed_bin_regressor_softplus(
            params["seed_bin_regressor"], xh)
        b_prev = seed_centers
    else:
        _, seed_centers = heads.seed_bin_regressor_normed(
            params["seed_bin_regressor"], xh, cfg.min_depth, cfg.max_depth)
        b_prev = (seed_centers - cfg.min_depth) / (cfg.max_depth - cfg.min_depth)
    prev_emb = heads.projector(params["seed_projector"], xh)

    blocks = [hooks["r4"], hooks["r3"], hooks["r2"], hooks["r1"]]
    b_centers = seed_centers
    for proj_p, attr_p, blk in zip(params["projectors"], params["attractors"], blocks):
        emb = heads.projector(proj_p, blk)
        if cfg.bin_centers_type == "softplus":
            b_prev, b_centers = heads.attractor_softplus(
                attr_p, emb, b_prev, prev_emb, alpha=cfg.attractor_alpha,
                gamma=cfg.attractor_gamma, kind=cfg.attractor_kind,
                attractor_type=cfg.attractor_type)
        else:
            b_prev, b_centers = heads.attractor_normed(
                attr_p, emb, b_prev, prev_emb, alpha=cfg.attractor_alpha,
                gamma=cfg.attractor_gamma, kind=cfg.attractor_kind,
                attractor_type=cfg.attractor_type,
                min_depth=cfg.min_depth, max_depth=cfg.max_depth)
        prev_emb = emb

    last = hooks["out_conv"]
    rel = rel_depth[:, None]
    if cfg.inverse_midas:
        rel = 1.0 / (rel + 1e-6)
        # per-image min/max (reference runs this batch-1 so global == per-
        # image there; batched dispatch must not couple images — least of
        # all the zero-padded tail rows of the bucketed depth pipeline)
        lo = rel.min(axis=(1, 2, 3), keepdims=True)
        hi = rel.max(axis=(1, 2, 3), keepdims=True)
        rel = (rel - lo) / (hi - lo)
    rel = resize_bilinear(rel, last.shape[-2:], align_corners=True)
    last = jnp.concatenate([last, rel], axis=1)

    emb_up = resize_bilinear(prev_emb, last.shape[-2:], align_corners=True)
    probs = heads.conditional_log_binomial(
        params["conditional_log_binomial"], last, emb_up, cfg.n_bins,
        cfg.min_temp, cfg.max_temp)
    centers_up = resize_bilinear(b_centers, probs.shape[-2:], align_corners=True)
    depth = jnp.sum(probs * centers_up, axis=1, keepdims=True)

    out = {"rel_depth": rel_depth, "metric_depth": depth, "feats": emb_up}
    if return_probs:
        out["probs"] = probs
        out["bin_centers"] = centers_up
    return out


def prep_size(h: int, w: int, cfg: ZoeConfig, keep_aspect_ratio: bool = True,
              resize_method: str = "minimal") -> tuple:
    """MiDaS Resize.get_size: target (net_h, net_w) = cfg.img_size, multiple of 32."""
    net_h, net_w = cfg.img_size
    scale_h = net_h / h
    scale_w = net_w / w
    if keep_aspect_ratio:
        if resize_method == "lower_bound":
            scale_h = scale_w = max(scale_h, scale_w)
        elif resize_method == "upper_bound":
            scale_h = scale_w = min(scale_h, scale_w)
        elif resize_method == "minimal":
            pick = scale_w if abs(1 - scale_w) < abs(1 - scale_h) else scale_h
            scale_h = scale_w = pick
        else:
            raise ValueError(resize_method)

    def mult(x, min_val=0, max_val=None):
        y = int(np.round(x / 32) * 32)
        if max_val is not None and y > max_val:
            y = int(np.floor(x / 32) * 32)
        if y < min_val:
            y = int(np.ceil(x / 32) * 32)
        return y

    if resize_method == "lower_bound":
        return mult(scale_h * h, min_val=net_h), mult(scale_w * w, min_val=net_w)
    if resize_method == "upper_bound":
        return mult(scale_h * h, max_val=net_h), mult(scale_w * w, max_val=net_w)
    return mult(scale_h * h), mult(scale_w * w)


def _prep(x: jnp.ndarray, cfg: ZoeConfig) -> jnp.ndarray:
    """Resize (bilinear, align_corners=True) + 0.5/0.5 normalize."""
    nh, nw = prep_size(x.shape[-2], x.shape[-1], cfg)
    x = resize_bilinear(x, (nh, nw), align_corners=True)
    return (x - 0.5) / 0.5


def _infer_once(params, x, cfg):
    xp = _prep(x, cfg)
    out = zoedepth_forward(params, xp, cfg)
    return out["metric_depth"], out["feats"]


def _infer_with_pad(params, x, cfg, pad_input=True, fh=3.0, fw=3.0):
    h, w = x.shape[-2:]
    pad_h = int(math.sqrt(h / 2) * fh) if pad_input else 0
    pad_w = int(math.sqrt(w / 2) * fw) if pad_input else 0
    if pad_input:
        x = jnp.pad(x, ((0, 0), (0, 0), (pad_h, pad_h), (pad_w, pad_w)),
                    mode="reflect")
    depth, feats = _infer_once(params, x, cfg)
    if depth.shape[-2:] != x.shape[-2:]:
        depth = resize_bicubic(depth, x.shape[-2:])
    if pad_h > 0:
        depth = depth[:, :, pad_h:-pad_h, :]
    if pad_w > 0:
        depth = depth[:, :, :, pad_w:-pad_w]
    return depth, feats


def zoedepth_infer(params: dict, x: jnp.ndarray, cfg: ZoeConfig,
                   pad_input: bool = True, with_flip_aug: bool = True,
                   return_feats: bool = False):
    """Reference ``DepthModel.infer``: pad-reflect + flip TTA averaged depth.

    x: raw [B, 3, H, W] in [0, 1] (ToTensor scale — NOT ImageNet-normalized).
    """
    depth, feats = _infer_with_pad(params, x, cfg, pad_input)
    if with_flip_aug:
        depth_f, feats_f = _infer_with_pad(params, x[..., ::-1], cfg, pad_input)
        depth = (depth + depth_f[..., ::-1]) / 2
        feats = (feats + feats_f[..., ::-1]) / 2
    if return_feats:
        return depth, feats
    return depth
