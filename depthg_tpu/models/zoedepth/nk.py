"""ZoeDepth-NK: two-headed (NYU/KITTI) variant with a patch-transformer router.

Port of reference ``zoedepth_nk_v1.py`` + ``patch_transformer.py``: a small
post-norm transformer over the bottleneck features votes for a domain; the
chosen domain's seed-bin regressor / attractor stack / conditional
log-binomial produces metric depth. Differences from the single-head model:
projector mlp_dim = bin_embedding_dim/2, CLB bottleneck_factor=4, and the CLB
input is the 32-channel head activation WITHOUT the relative-depth channel.

TPU note: the data-dependent domain choice becomes ``lax.switch`` over the two
head branches (the reference uses a host-side ``.item()`` branch).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from depthg_tpu.models.layers import linear, torch_linear_init, layer_norm, layer_norm_init
from depthg_tpu.models.zoedepth import heads
from depthg_tpu.models.zoedepth.beit import BEiTConfig, beit_forward, beit_init
from depthg_tpu.models.zoedepth.dpt import DPTConfig, dpt_forward, dpt_init
from depthg_tpu.models.zoedepth.layers import conv2d, conv_init
from depthg_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class BinConf:
    name: str
    n_bins: int
    min_depth: float
    max_depth: float


@dataclasses.dataclass(frozen=True)
class ZoeNKConfig:
    bin_confs: tuple = (BinConf("nyu", 64, 1e-3, 10.0),
                        BinConf("kitti", 64, 1e-3, 80.0))
    bin_embedding_dim: int = 128
    bin_centers_type: str = "softplus"
    n_attractors: tuple = (16, 8, 4, 1)
    attractor_alpha: float = 1000.0
    attractor_gamma: float = 2.0
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    router_dim: int = 128
    router_heads: int = 4
    router_layers: int = 4
    beit: BEiTConfig = BEiTConfig()
    dpt: DPTConfig = DPTConfig()


def _encoder_layer_init(key, d, ff, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "attn": {"in_proj": torch_linear_init(k1, d, 3 * d, dtype),
                 "out_proj": torch_linear_init(k2, d, d, dtype)},
        "norm1": layer_norm_init(d, dtype),
        "fc1": torch_linear_init(k3, d, ff, dtype),
        "fc2": torch_linear_init(k4, ff, d, dtype),
        "norm2": layer_norm_init(d, dtype),
    }


def _encoder_layer(p, x, heads_n):
    """torch TransformerEncoderLayer (post-norm, relu FF); x: [B, S, D]."""
    from depthg_tpu.models.featurizer_depth import _multihead_attention

    y = _multihead_attention(p["attn"], x, x, x, heads_n, 0.0)
    x = layer_norm(p["norm1"], x + y, 1e-5)
    y = linear(p["fc2"], jax.nn.relu(linear(p["fc1"], x)))
    return layer_norm(p["norm2"], x + y, 1e-5)


def _positional_encoding_1d(s, d):
    pos = jnp.arange(s, dtype=jnp.float32)[:, None]
    idx = jnp.arange(0, d, 2, dtype=jnp.float32)[None]
    div = jnp.exp(idx * (-math.log(10000.0) / d))
    pe = pos * div
    return jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=1)  # [S, D]


def zoedepth_nk_init(key: jax.Array, cfg: ZoeNKConfig, dtype=jnp.float32) -> dict:
    kb, kd, k1, kr, kc, k4, k5 = jax.random.split(key, 7)
    btlnck = cfg.dpt.features
    emb = cfg.bin_embedding_dim
    params: dict = {
        "beit": beit_init(kb, cfg.beit, dtype),
        "dpt": dpt_init(kd, cfg.dpt, dtype),
        "conv2": conv_init(k1, btlnck, btlnck, 1, dtype),
        "router": {
            "embed": conv_init(kr, btlnck, cfg.router_dim, 1, dtype),
            "layers": [_encoder_layer_init(jax.random.fold_in(kr, i),
                                           cfg.router_dim, 1024, dtype)
                       for i in range(cfg.router_layers)],
            "cls1": torch_linear_init(kc, cfg.router_dim, cfg.router_dim, dtype),
            "cls2": torch_linear_init(jax.random.fold_in(kc, 1), cfg.router_dim, 2, dtype),
        },
        "seed_projector": heads.mlp2_init(k4, btlnck, emb // 2, emb, dtype),
        "projectors": [heads.mlp2_init(jax.random.fold_in(k4, i), btlnck,
                                       emb // 2, emb, dtype) for i in range(4)],
        "domains": {},
    }
    for conf in cfg.bin_confs:
        kd2 = jax.random.fold_in(k5, hash(conf.name) % 2**31)
        params["domains"][conf.name] = {
            "seed_bin_regressor": heads.mlp2_init(kd2, btlnck, emb // 2,
                                                  conf.n_bins, dtype),
            "attractors": [heads.mlp2_init(jax.random.fold_in(kd2, i), emb, emb,
                                           cfg.n_attractors[i], dtype)
                           for i in range(4)],
            "clb": [conv_init(jax.random.fold_in(kd2, 10), 32 + emb,
                              (32 + emb) // 4, 1, dtype),
                    conv_init(jax.random.fold_in(kd2, 11), (32 + emb) // 4,
                              4, 1, dtype)],
        }
    return params


def _router(p, x, cfg: ZoeNKConfig):
    """Patch transformer + mlp classifier -> domain logits [B, 2]."""
    emb = conv2d(p["embed"], x)                       # [B, E, H, W]
    tok = emb.reshape(*emb.shape[:2], -1).transpose(0, 2, 1)  # [B, S, E]
    tok = tok + _positional_encoding_1d(tok.shape[1], tok.shape[2])[None]
    for layer in p["layers"]:
        tok = _encoder_layer(layer, tok, cfg.router_heads)
    first = tok[:, 0]  # reference takes transformer output index 0
    return linear(p["cls2"], jax.nn.relu(linear(p["cls1"], first)))


def zoedepth_nk_forward(params: dict, x: jnp.ndarray, cfg: ZoeNKConfig) -> dict:
    taps, grid = beit_forward(params["beit"], x, cfg.beit)
    rel_depth, hooks = dpt_forward(params["dpt"], taps, grid, cfg.dpt)

    btlnck = conv2d(params["conv2"], hooks["l4_rn"])
    domain_logits = _router(params["router"], btlnck, cfg)
    domain_vote = jax.nn.softmax(domain_logits.sum(axis=0), axis=-1)
    domain_idx = jnp.argmax(domain_vote)

    blocks = [hooks["r4"], hooks["r3"], hooks["r2"], hooks["r1"]]
    last = hooks["out_conv"]
    prev_emb0 = heads.projector(params["seed_projector"], btlnck)

    def run_domain(conf: BinConf):
        dp = params["domains"][conf.name]

        def f(_):
            _, seed_centers = heads.seed_bin_regressor_softplus(
                dp["seed_bin_regressor"], btlnck)
            b_prev, prev_emb = seed_centers, prev_emb0
            b_centers = seed_centers
            for proj_p, attr_p, blk in zip(params["projectors"], dp["attractors"], blocks):
                emb = heads.projector(proj_p, blk)
                b_prev, b_centers = heads.attractor_softplus(
                    attr_p, emb, b_prev, prev_emb, alpha=cfg.attractor_alpha,
                    gamma=cfg.attractor_gamma, kind=cfg.attractor_kind,
                    attractor_type=cfg.attractor_type)
                prev_emb = emb
            centers_up = resize_bilinear(b_centers, last.shape[-2:], align_corners=True)
            emb_up = resize_bilinear(prev_emb, last.shape[-2:], align_corners=True)
            probs = heads.conditional_log_binomial(
                dp["clb"], last, emb_up, conf.n_bins, cfg.min_temp, cfg.max_temp)
            return jnp.sum(probs * centers_up, axis=1, keepdims=True)

        return f

    depth = jax.lax.switch(domain_idx, [run_domain(c) for c in cfg.bin_confs], None)
    return {"rel_depth": rel_depth, "metric_depth": depth,
            "domain_logits": domain_logits}
