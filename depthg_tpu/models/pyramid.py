"""FeaturePyramidNet (arch="feature-pyramid") + minimal ResNet-50 backbone.

Behavioral port of reference ``FeaturePyramidNet`` / ``DoubleConv`` /
``NetWithActivations`` (``src/modules.py:678-786, 1489-1507``) and the
``load_model`` ResNet path (``src/utils.py:68-124``). Unused by the paper
configs (SURVEY.md §2.1) but part of the component surface.

The ResNet-50 is a functional JAX implementation with a torchvision
state-dict converter; BatchNorm runs in inference mode (running stats) —
the backbone is frozen in this architecture (``src/modules.py:733``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.models.zoedepth.layers import conv2d, conv_init
from depthg_tpu.ops.resize import resize_bilinear


# ---------------- ResNet-50 (frozen backbone) ----------------

def _bn_init(ch, dtype=jnp.float32):
    return {"g": jnp.ones((ch,), dtype), "b": jnp.zeros((ch,), dtype),
            "mean": jnp.zeros((ch,), dtype), "var": jnp.ones((ch,), dtype)}


def batch_norm(p, x, eps=1e-5):
    inv = jax.lax.rsqrt(p["var"] + eps)
    return ((x - p["mean"][None, :, None, None]) * inv[None, :, None, None]
            * p["g"][None, :, None, None] + p["b"][None, :, None, None])


def batch_norm_train(p, x, eps=1e-5):
    """torch train-mode BN: normalize by biased batch stats; also return the
    batch statistics (mean, UNBIASED var — torch's running_var update uses the
    unbiased estimator) for the caller's running-stat EMA."""
    axes = (0, 2, 3)
    mean = jnp.mean(x, axes)
    var = jnp.var(x, axes)
    n = x.shape[0] * x.shape[2] * x.shape[3]
    var_unbiased = var * (n / max(n - 1, 1))
    inv = jax.lax.rsqrt(var + eps)
    y = ((x - mean[None, :, None, None]) * inv[None, :, None, None]
         * p["g"][None, :, None, None] + p["b"][None, :, None, None])
    return y, {"mean": mean, "var": var_unbiased}


def _bottleneck_init(key, in_ch, mid, out_ch, stride, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "conv1": conv_init(k1, in_ch, mid, 1, dtype, bias=False), "bn1": _bn_init(mid),
        "conv2": conv_init(k2, mid, mid, 3, dtype, bias=False), "bn2": _bn_init(mid),
        "conv3": conv_init(k3, mid, out_ch, 1, dtype, bias=False), "bn3": _bn_init(out_ch),
    }
    if stride != 1 or in_ch != out_ch:
        p["down"] = {"conv": conv_init(k4, in_ch, out_ch, 1, dtype, bias=False),
                     "bn": _bn_init(out_ch)}
    return p


def _bottleneck(p, x, stride):
    # stride is static structure (first block of layers 2-4), kept out of the
    # param pytree so device_put never turns it into a traced value
    y = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x)))
    y = jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], y, stride=stride, padding=1)))
    y = batch_norm(p["bn3"], conv2d(p["conv3"], y))
    if "down" in p:
        x = batch_norm(p["down"]["bn"], conv2d(p["down"]["conv"], x, stride=stride))
    return jax.nn.relu(x + y)


_R50_LAYERS = [(3, 64, 256, 1), (4, 128, 512, 2), (6, 256, 1024, 2), (3, 512, 2048, 2)]


def resnet50_init(key: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 64))
    params = {"conv1": conv_init(next(keys), 3, 64, 7, dtype, bias=False),
              "bn1": _bn_init(64), "layers": []}
    in_ch = 64
    for blocks, mid, out_ch, stride in _R50_LAYERS:
        layer = []
        for b in range(blocks):
            layer.append(_bottleneck_init(next(keys), in_ch, mid, out_ch,
                                          stride if b == 0 else 1, dtype))
            in_ch = out_ch
        params["layers"].append(layer)
    return params


def _max_pool_3x3_s2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 3, 3),
                                 (1, 1, 2, 2), [(0, 0), (0, 0), (1, 1), (1, 1)])


def resnet50_activations(params: dict, x: jnp.ndarray, layer_nums=(5, 6, 7)) -> dict:
    """Mirror of ``NetWithActivations`` over torchvision child indices:
    4=layer1 (1/4), 5=layer2 (1/8), 6=layer3 (1/16), 7=layer4 (1/32)."""
    x = jax.nn.relu(batch_norm(params["bn1"], conv2d(params["conv1"], x, stride=2, padding=3)))
    x = _max_pool_3x3_s2(x)
    acts = {}
    for i, layer in enumerate(params["layers"]):
        layer_stride = _R50_LAYERS[i][3]
        for b, blk in enumerate(layer):
            x = _bottleneck(blk, x, layer_stride if b == 0 else 1)
        child_idx = 4 + i
        if child_idx in layer_nums:
            acts[child_idx] = x
    return acts


def resnet50_from_torch(sd: dict) -> dict:
    """torchvision resnet50 state dict -> param pytree."""
    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def bn(prefix):
        return {"g": np_(sd[prefix + ".weight"]), "b": np_(sd[prefix + ".bias"]),
                "mean": np_(sd[prefix + ".running_mean"]),
                "var": np_(sd[prefix + ".running_var"])}

    params = {"conv1": {"w": np_(sd["conv1.weight"])}, "bn1": bn("bn1"), "layers": []}
    for li, (blocks, _, _, stride) in enumerate(_R50_LAYERS, start=1):
        layer = []
        for b in range(blocks):
            p = f"layer{li}.{b}"
            blk = {"conv1": {"w": np_(sd[p + ".conv1.weight"])}, "bn1": bn(p + ".bn1"),
                   "conv2": {"w": np_(sd[p + ".conv2.weight"])}, "bn2": bn(p + ".bn2"),
                   "conv3": {"w": np_(sd[p + ".conv3.weight"])}, "bn3": bn(p + ".bn3")}
            if p + ".downsample.0.weight" in sd:
                blk["down"] = {"conv": {"w": np_(sd[p + ".downsample.0.weight"])},
                               "bn": bn(p + ".downsample.1")}
            layer.append(blk)
        params["layers"].append(layer)
    return params


# ---------------- VGG-11 (load_model "vgg11") ----------------

_VGG11_CFG = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]


def vgg11_init(key: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    convs = []
    in_ch = 3
    for v in _VGG11_CFG:
        if v == "M":
            continue
        convs.append(conv_init(next(keys), in_ch, v, 3, dtype))
        in_ch = v
    return {"convs": convs}


def _max_pool_2x2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 1, 2, 2),
                                 (1, 1, 2, 2), "VALID")


def vgg11_features(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """torchvision vgg11.features forward -> [B, 512, H/32, W/32]."""
    ci = 0
    for v in _VGG11_CFG:
        if v == "M":
            x = _max_pool_2x2(x)
        else:
            x = jax.nn.relu(conv2d(params["convs"][ci], x, padding=1))
            ci += 1
    return x


def vgg11_from_torch(sd: dict) -> dict:
    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    idxs = sorted({int(k.split(".")[1]) for k in sd
                   if k.startswith("features.") and k.endswith(".weight")})
    return {"convs": [{"w": np_(sd[f"features.{i}.weight"]),
                       "b": np_(sd[f"features.{i}.bias"])} for i in idxs]}


# ---------------- DenseNet-121 (load_model "densenet121") ----------------

_DN121_BLOCKS = (6, 12, 24, 16)
_DN_GROWTH = 32


def densenet121_init(key: jax.Array, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 256))
    params: dict = {"conv0": conv_init(next(keys), 3, 64, 7, dtype, bias=False),
                    "norm0": _bn_init(64), "blocks": [], "transitions": []}
    ch = 64
    for bi, n_layers in enumerate(_DN121_BLOCKS):
        block = []
        for _ in range(n_layers):
            block.append({
                "norm1": _bn_init(ch),
                "conv1": conv_init(next(keys), ch, 4 * _DN_GROWTH, 1, dtype, bias=False),
                "norm2": _bn_init(4 * _DN_GROWTH),
                "conv2": conv_init(next(keys), 4 * _DN_GROWTH, _DN_GROWTH, 3, dtype, bias=False),
            })
            ch += _DN_GROWTH
        params["blocks"].append(block)
        if bi < len(_DN121_BLOCKS) - 1:
            params["transitions"].append({
                "norm": _bn_init(ch),
                "conv": conv_init(next(keys), ch, ch // 2, 1, dtype, bias=False)})
            ch //= 2
    params["norm5"] = _bn_init(ch)
    return params


def _avg_pool_2x2(x):
    return jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 1, 2, 2),
                                 (1, 1, 2, 2), "VALID") / 4.0


def densenet121_features(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    """torchvision densenet121.features -> [B, 1024, H/32, W/32].

    Reference quirk preserved: ``Sequential(*children[:-1] + [AvgPool])``
    (``src/utils.py:114-116``) drops the ReLU that torchvision's own
    ``forward`` applies after ``norm5`` — so no trailing ReLU here either.
    """
    x = batch_norm(params["norm0"], conv2d(params["conv0"], x, stride=2, padding=3))
    x = _max_pool_3x3_s2(jax.nn.relu(x))
    for bi, block in enumerate(params["blocks"]):
        for layer in block:
            h = conv2d(layer["conv1"], jax.nn.relu(batch_norm(layer["norm1"], x)))
            h = conv2d(layer["conv2"], jax.nn.relu(batch_norm(layer["norm2"], h)), padding=1)
            x = jnp.concatenate([x, h], axis=1)
        if bi < len(params["transitions"]):
            tr = params["transitions"][bi]
            x = _avg_pool_2x2(conv2d(tr["conv"], jax.nn.relu(batch_norm(tr["norm"], x))))
    return batch_norm(params["norm5"], x)


def densenet121_from_torch(sd: dict) -> dict:
    def np_(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    def bn(prefix):
        return {"g": np_(sd[prefix + ".weight"]), "b": np_(sd[prefix + ".bias"]),
                "mean": np_(sd[prefix + ".running_mean"]),
                "var": np_(sd[prefix + ".running_var"])}

    f = "features."
    params: dict = {"conv0": {"w": np_(sd[f + "conv0.weight"])},
                    "norm0": bn(f + "norm0"), "blocks": [], "transitions": []}
    for bi, n_layers in enumerate(_DN121_BLOCKS, start=1):
        block = []
        for li in range(1, n_layers + 1):
            p = f"{f}denseblock{bi}.denselayer{li}"
            block.append({"norm1": bn(p + ".norm1"),
                          "conv1": {"w": np_(sd[p + ".conv1.weight"])},
                          "norm2": bn(p + ".norm2"),
                          "conv2": {"w": np_(sd[p + ".conv2.weight"])}})
        params["blocks"].append(block)
        if bi < len(_DN121_BLOCKS):
            p = f"{f}transition{bi}"
            params["transitions"].append({"norm": bn(p + ".norm"),
                                          "conv": {"w": np_(sd[p + ".conv.weight"])}})
    params["norm5"] = bn(f + "norm5")
    return params


# ---------------- load_model (reference src/utils.py:68-124) ----------------

_MODEL_FILES = {
    "robust_resnet50": "imagenet_l2_3_0.pt",
    "densecl": "densecl_r50_coco_1600ep.pth",
    "mocov2": "moco_v2_800ep_pretrain.pth.tar",
    "resnet50": "resnet50-0676ba61.pth",       # torchvision IMAGENET1K_V1
    "densenet121": "densenet121-a639ec97.pth",
    "vgg11": "vgg11-8a719046.pth",
}

# model_types whose load_model returns the resnet50 layout (n_feats=2048) —
# the only family FeaturePyramidNet's hard-coded channel table accepts
# (reference src/modules.py:703-704)
RESNET50_MODEL_TYPES = frozenset(
    {"robust_resnet50", "densecl", "mocov2", "resnet50"})


def load_model(model_type: str, data_dir: str):
    """Reference ``load_model`` equivalent: returns (params, features_fn,
    n_feats). ``features_fn(params, x)`` yields the pre-pool feature map;
    global pooling (``model(img).mean([2,3])`` in precompute_knns) is the
    caller's. Weight files must already be in ``data_dir`` (zero egress —
    the reference wget-downloads them, src/utils.py:72-101).

    Each checkpoint's key-layout quirk is reproduced: robust_resnet50 stores
    {"model": {...'model.'-containing keys...}}, mocov2 under
    ``module.encoder_q.``, densecl plainly under ``state_dict``.
    """
    import os
    from os.path import join

    import torch

    if model_type not in _MODEL_FILES:
        # reference load_model's terminal branch (src/utils.py:120) —
        # raised here BEFORE the path join so an unknown type can't turn
        # into torch.load(<data_dir>) / a misleading missing-file message
        raise ValueError(f"No model: {model_type} found")
    path = join(data_dir, _MODEL_FILES[model_type])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{model_type} weights not found at {path}; the reference downloads "
            f"them (src/utils.py:68-124) but this environment has no egress — "
            f"place the file there manually")
    blob = torch.load(path, map_location="cpu", weights_only=False)

    if model_type == "robust_resnet50":
        sd = {name.split("model.")[1]: v for name, v in blob["model"].items()
              if "model" in name}
        return resnet50_from_torch(sd), resnet50_last_features, 2048
    if model_type == "mocov2":
        sd = {k[len("module.encoder_q."):]: v
              for k, v in blob["state_dict"].items()
              if k.startswith("module.encoder_q") and not k.startswith("module.encoder_q.fc")}
        return resnet50_from_torch(sd), resnet50_last_features, 2048
    if model_type == "densecl":
        return resnet50_from_torch(blob["state_dict"]), resnet50_last_features, 2048
    if model_type == "resnet50":
        return resnet50_from_torch(blob), resnet50_last_features, 2048
    if model_type == "densenet121":
        return densenet121_from_torch(blob), densenet121_features, 1024
    if model_type == "vgg11":
        return vgg11_from_torch(blob), vgg11_features, 512
    raise ValueError(f"No model: {model_type} found")


def resnet50_last_features(params: dict, x: jnp.ndarray) -> jnp.ndarray:
    return resnet50_activations(params, x, layer_nums=(7,))[7]


# ---------------- FeaturePyramidNet ----------------

@dataclasses.dataclass(frozen=True)
class PyramidConfig:
    granularity: int = 1
    dim: int = 70
    continuous: bool = True
    layer_nums: tuple = (5, 6, 7)
    feat_channels: tuple = (2048, 1024, 512, 3)
    extra_channels: tuple = (128, 64, 32, 32)
    out_size: int = 56  # the reference's hard-coded interpolation target
    bn_momentum: float = 0.1  # torch BatchNorm2d default

    @property
    def n_feats(self) -> int:
        # reference FeaturePyramidNet.n_feats = self.dim (src/modules.py:707)
        return self.dim


def _double_conv_init(key, in_ch, out_ch, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"conv1": conv_init(k1, in_ch, out_ch, 3, dtype), "bn1": _bn_init(out_ch),
            "conv2": conv_init(k2, out_ch, out_ch, 3, dtype), "bn2": _bn_init(out_ch)}


def _double_conv(p, x):
    x = jax.nn.relu(batch_norm(p["bn1"], conv2d(p["conv1"], x, padding=1)))
    return jax.nn.relu(batch_norm(p["bn2"], conv2d(p["conv2"], x, padding=1)))


def _double_conv_train(p, x):
    """Train-mode DoubleConv: batch-stat BN (reference trains the pyramid's
    BN layers, ``src/modules.py:769-786``); returns batch stats per BN."""
    x, s1 = batch_norm_train(p["bn1"], conv2d(p["conv1"], x, padding=1))
    x = jax.nn.relu(x)
    x, s2 = batch_norm_train(p["bn2"], conv2d(p["conv2"], x, padding=1))
    return jax.nn.relu(x), {"bn1": s1, "bn2": s2}


def pyramid_init(key: jax.Array, cfg: PyramidConfig, dtype=jnp.float32) -> dict:
    keys = iter(jax.random.split(key, 16))
    fc = cfg.feat_channels
    ec = cfg.extra_channels
    params: dict = {"cluster1": conv_init(next(keys), fc[0], cfg.dim, 1, dtype)}
    if cfg.granularity >= 2:
        params["conv2"] = _double_conv_init(next(keys), fc[0] + fc[1], ec[1], dtype)
        params["cluster2"] = conv_init(next(keys), ec[1], cfg.dim, 1, dtype)
    if cfg.granularity >= 3:
        params["conv3"] = _double_conv_init(next(keys), ec[1] + fc[2], ec[2], dtype)
        params["cluster3"] = conv_init(next(keys), ec[2], cfg.dim, 1, dtype)
    if cfg.granularity >= 4:
        params["conv4"] = _double_conv_init(next(keys), ec[2] + fc[3], ec[3], dtype)
        params["cluster4"] = conv_init(next(keys), ec[3], cfg.dim, 1, dtype)
    return params


def _pyramid_forward(params: dict, backbone: dict, x: jnp.ndarray,
                     cfg: PyramidConfig, train: bool,
                     backbone_dtype: str | None = None):
    if backbone_dtype == "int8":
        raise NotImplementedError(
            "backbone_dtype='int8' is ViT-only (models/vit.py "
            "quantize_vit_params); the ResNet pyramid backbone supports "
            "float32 | bfloat16")
    if backbone_dtype == "bfloat16":
        # same mechanism as the ViT featurizer (featurizer.backbone_features):
        # the frozen ResNet is stop-gradient feature extraction, so bf16
        # params+input halve its HBM traffic; features return f32 so the
        # trainable head/losses keep full precision
        from depthg_tpu.models.layers import cast_tree_bf16
        backbone = cast_tree_bf16(backbone)
        feats = resnet50_activations(backbone, x.astype(jnp.bfloat16),
                                     cfg.layer_nums)
        feats = {k: v.astype(jnp.float32) for k, v in feats.items()}
    else:
        feats = resnet50_activations(backbone, x, cfg.layer_nums)
    feats = {k: jax.lax.stop_gradient(v) for k, v in feats.items()}
    low = feats[cfg.layer_nums[-1]]

    def clusterer(p, t):
        return resize_bilinear(conv2d(p, t), cfg.out_size)[..., None]

    def dconv(name, t):
        if train:
            y, s = _double_conv_train(params[name], t)
            bn_stats[name] = s
            return y
        return _double_conv(params[name], t)

    bn_stats: dict = {}
    all_clusters = [clusterer(params["cluster1"], low)]
    if cfg.granularity >= 2:
        up = resize_bilinear(low, (low.shape[-2] * 2, low.shape[-1] * 2))
        f2 = dconv("conv2", jnp.concatenate([up, feats[cfg.layer_nums[-2]]], axis=1))
        all_clusters.append(clusterer(params["cluster2"], f2))
    if cfg.granularity >= 3:
        up = resize_bilinear(f2, (f2.shape[-2] * 2, f2.shape[-1] * 2))
        f3 = dconv("conv3", jnp.concatenate([up, feats[cfg.layer_nums[-3]]], axis=1))
        all_clusters.append(clusterer(params["cluster3"], f3))
    if cfg.granularity >= 4:
        up = resize_bilinear(f3, (f3.shape[-2] * 2, f3.shape[-1] * 2))
        img_ds = resize_bilinear(x, cfg.out_size)
        f4 = dconv("conv4", jnp.concatenate([up, img_ds], axis=1))
        all_clusters.append(clusterer(params["cluster4"], f4))

    avg_code = jnp.concatenate(all_clusters, axis=4).mean(axis=4)
    clusters = avg_code if cfg.continuous else jax.nn.log_softmax(avg_code, axis=1)
    return low, clusters, bn_stats


def pyramid_apply(params: dict, backbone: dict, x: jnp.ndarray, cfg: PyramidConfig):
    """Returns (low_res_feats, clusters) like reference ``forward``
    (``src/modules.py:732-766``); eval mode (running-stat BN)."""
    low, clusters, _ = _pyramid_forward(params, backbone, x, cfg, train=False)
    return low, clusters


# ---------------- featurizer-compatible wrapper (arch="feature-pyramid") ----


def pyramid_featurizer_init(key: jax.Array, cfg: PyramidConfig,
                            dtype=jnp.float32) -> dict:
    """Segmenter net layout for arch="feature-pyramid": the pyramid head
    params plus the frozen backbone under the generic ``vit`` slot (the name
    the train state uses for whatever frozen backbone the arch carries)."""
    kb, kp = jax.random.split(key)
    return {"vit": resnet50_init(kb, dtype), **pyramid_init(kp, cfg, dtype)}


def pyramid_featurizer_apply(params: dict, img: jnp.ndarray, cfg: PyramidConfig,
                             train: bool = False,
                             backbone_dtype: str | None = None) -> dict:
    """dispatch_apply-compatible forward: ``params`` = pyramid head params +
    the backbone under ``vit``. Returns dict(feats, code, attn=None[,
    bn_stats]) — ``bn_stats`` (train only) are the DoubleConv batch statistics
    for the caller's running-stat EMA (see ``merge_bn_stats``)."""
    head = {k: v for k, v in params.items() if k != "vit"}
    low, clusters, bn_stats = _pyramid_forward(head, params["vit"], img, cfg,
                                               train, backbone_dtype)
    out = {"feats": low, "code": clusters, "attn": None}
    if train:
        out["bn_stats"] = bn_stats
    return out


def merge_bn_stats(net_params: dict, bn_stats_list, momentum: float = 0.1) -> dict:
    """Fold batch statistics into the BN running stats (torch semantics:
    ``running = (1-m)*running + m*batch`` per forward, applied in forward
    order — the reference updates on every train-mode forward)."""
    out = dict(net_params)
    for bn_stats in bn_stats_list:
        for conv_name, convs in bn_stats.items():
            blk = dict(out[conv_name])
            for bn_name, stats in convs.items():
                bn = dict(blk[bn_name])
                bn["mean"] = (1 - momentum) * bn["mean"] + momentum * stats["mean"]
                bn["var"] = (1 - momentum) * bn["var"] + momentum * stats["var"]
                blk[bn_name] = bn
            out[conv_name] = blk
    return out
