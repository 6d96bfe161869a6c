"""DPT decoder (MiDaS 3.1 "scratch" head) over BEiT taps, functional JAX.

Reproduces the torch-hub DPT_BEiT_L_384 decoder the reference consumes
(``src/zoedepth/models/base_models/midas.py:297-319`` harvests its
intermediate activations with forward hooks): readout-project of the cls
token, 4-scale reassembly (deconv4 / deconv2 / identity / stride-2 conv),
3x3 "rn" projections to 256ch, RefineNet-style fusion with residual conv
units (align_corners=True interpolation), and the monocular-depth output head.

Returns the 6 activations the reference taps: out_conv (32ch, full prep res),
l4_rn (1/32), r4 (1/16), r3 (1/8), r2 (1/4), r1 (1/2) plus the relative depth.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from depthg_tpu.models.layers import linear
from depthg_tpu.models.vit import trunc_normal_init
from depthg_tpu.models.zoedepth.layers import conv2d, conv_init, deconv_init, deconv_kxk
from depthg_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    embed_dim: int = 1024
    features: int = 256
    reassemble_channels: tuple = (256, 512, 1024, 1024)


def dpt_init(key: jax.Array, cfg: DPTConfig, dtype=jnp.float32) -> dict:
    d = cfg.embed_dim
    f = cfg.features
    keys = iter(jax.random.split(key, 40))
    params: dict = {"readout": [], "reassemble": [], "rn": [], "fusion": []}
    for ch in cfg.reassemble_channels:
        params["readout"].append({"w": trunc_normal_init(next(keys), (2 * d, d), dtype=dtype),
                                  "b": jnp.zeros((d,), dtype)})
        params["reassemble"].append({"project": conv_init(next(keys), d, ch, 1, dtype)})
    params["reassemble"][0]["resample"] = deconv_init(next(keys), cfg.reassemble_channels[0],
                                                      cfg.reassemble_channels[0], 4, dtype)
    params["reassemble"][1]["resample"] = deconv_init(next(keys), cfg.reassemble_channels[1],
                                                      cfg.reassemble_channels[1], 2, dtype)
    params["reassemble"][3]["resample"] = conv_init(next(keys), cfg.reassemble_channels[3],
                                                    cfg.reassemble_channels[3], 3, dtype)
    for ch in cfg.reassemble_channels:
        params["rn"].append(conv_init(next(keys), ch, f, 3, dtype, bias=False))

    def rcu():
        return {"conv1": conv_init(next(keys), f, f, 3, dtype),
                "conv2": conv_init(next(keys), f, f, 3, dtype)}

    for _ in range(4):
        params["fusion"].append({"rcu1": rcu(), "rcu2": rcu(),
                                 "out": conv_init(next(keys), f, f, 1, dtype)})
    params["head"] = {
        "conv1": conv_init(next(keys), f, f // 2, 3, dtype),
        "conv2": conv_init(next(keys), f // 2, 32, 3, dtype),
        "conv3": conv_init(next(keys), 32, 1, 1, dtype),
    }
    return params


def _residual_conv_unit(p: dict, x: jnp.ndarray) -> jnp.ndarray:
    y = conv2d(p["conv1"], jax.nn.relu(x), padding=1)
    y = conv2d(p["conv2"], jax.nn.relu(y), padding=1)
    return x + y


def _fusion(p: dict, x: jnp.ndarray, skip: jnp.ndarray | None, out_hw) -> jnp.ndarray:
    if skip is not None:
        x = x + _residual_conv_unit(p["rcu1"], skip)
    x = _residual_conv_unit(p["rcu2"], x)
    x = resize_bilinear(x, out_hw, align_corners=True)
    return conv2d(p["out"], x)


def dpt_forward(params: dict, taps: list, grid_hw: tuple, cfg: DPTConfig):
    """taps: 4 token tensors [B, 1+N, D]; grid_hw: patch grid (h, w).

    Returns (rel_depth [B, H, W], hooks dict).
    """
    h, w = grid_hw
    maps = []
    for i, tok in enumerate(taps):
        cls = tok[:, :1]
        patches = tok[:, 1:]
        if params["readout"][i] is None:
            # Slice readout variant (parameter-free, isl-org/MiDaS vit.py)
            proj = patches
        else:
            readout = jnp.concatenate(
                [patches, jnp.broadcast_to(cls, patches.shape)], axis=-1)
            proj = jax.nn.gelu(linear(params["readout"][i], readout), approximate=False)
        fmap = jnp.transpose(proj, (0, 2, 1)).reshape(proj.shape[0], -1, h, w)
        fmap = conv2d(params["reassemble"][i]["project"], fmap)
        if i == 0:
            fmap = deconv_kxk(params["reassemble"][i]["resample"], fmap)  # x4
        elif i == 1:
            fmap = deconv_kxk(params["reassemble"][i]["resample"], fmap)  # x2
        elif i == 3:
            fmap = conv2d(params["reassemble"][i]["resample"], fmap, stride=2, padding=1)
        maps.append(fmap)

    l1, l2, l3, l4 = [conv2d(params["rn"][i], maps[i], padding=1) for i in range(4)]

    hooks = {"l4_rn": l4}
    p4 = _fusion(params["fusion"][0], l4, None, l3.shape[-2:])
    hooks["r4"] = p4
    p3 = _fusion(params["fusion"][1], p4, l3, l2.shape[-2:])
    hooks["r3"] = p3
    p2 = _fusion(params["fusion"][2], p3, l2, l1.shape[-2:])
    hooks["r2"] = p2
    p1 = _fusion(params["fusion"][3], p2, l1,
                 (l1.shape[-2] * 2, l1.shape[-1] * 2))
    hooks["r1"] = p1

    head = params["head"]
    y = conv2d(head["conv1"], p1, padding=1)
    y = resize_bilinear(y, (y.shape[-2] * 2, y.shape[-1] * 2), align_corners=True)
    y = jax.nn.relu(conv2d(head["conv2"], y, padding=1))
    hooks["out_conv"] = y
    y = jax.nn.relu(conv2d(head["conv3"], y))
    rel_depth = y[:, 0]
    return rel_depth, hooks
