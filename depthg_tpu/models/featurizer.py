"""DINO featurizer: frozen ViT patch features + trainable projection head.

Behavioral spec from the reference ``DinoFeaturizer`` (``src/modules.py:19-137``):

* frozen backbone — tokens of the last block, cls dropped, reshaped to a
  [B, C, H/ps, W/ps] grid (row-major);
* optional "KK" feature type: per-head keys of the last block
  (``src/modules.py:112-115``);
* projection ``code``: 1x1-conv ``cluster1`` plus (for projection_type
  "nonlinear") a conv-relu-conv ``cluster2``, each applied to an independently
  Dropout2d(p=.1)-masked copy of the features;
* train mode returns (feats[, dropout], code, attn); eval returns (feats, code).

TPU-first: the whole thing is one pure function; the frozen backbone runs
under ``stop_gradient`` so XLA never builds a backward graph for it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from depthg_tpu.models import vit as vit_lib
from depthg_tpu.models.layers import (cast_tree_bf16, conv1x1, conv1x1_init,
                                      dropout2d)


@dataclasses.dataclass(frozen=True)
class FeaturizerConfig:
    arch: str = "vit_small"          # cfg.model_type in the reference
    patch_size: int = 8              # cfg.dino_patch_size
    feat_type: str = "feat"          # cfg.dino_feat_type: "feat" | "KK"
    projection_type: str = "nonlinear"  # cfg.projection_type: "nonlinear" | "linear" | None
    dim: int = 70                    # projection output dim
    dropout: bool = True             # cfg.dropout: Dropout2d(.1) on returned feats
    drop_rate: float = 0.1
    vit_config: "vit_lib.ViTConfig | None" = None  # override (tests / custom backbones)
    # "auto" = fused flash attention on TPU whenever the attn matrix isn't
    # consumed (the [N,N] softmax never touches HBM); "xla" | "flash" |
    # "fused" (ops/attention.py whole-KV kernel) force a specific path.
    attention_impl: str = "auto"

    @property
    def vit(self) -> vit_lib.ViTConfig:
        if self.vit_config is not None:
            return self.vit_config
        return vit_lib.make_config(self.arch, self.patch_size)

    @property
    def n_feats(self) -> int:
        return self.vit.embed_dim


def from_cfg(cfg) -> FeaturizerConfig:
    """Build from a reference-style run config (local_config.yml keys)."""
    return FeaturizerConfig(
        arch=cfg.model_type,
        patch_size=cfg.dino_patch_size,
        feat_type=cfg.dino_feat_type,
        projection_type=cfg.projection_type,
        dim=cfg.dim,
        dropout=bool(cfg.dropout),
        attention_impl=str(getattr(cfg, "attention_impl", "auto")),
    )


def featurizer_init(key: jax.Array, fcfg: FeaturizerConfig, dtype=jnp.float32) -> dict:
    kv, k1, k2a, k2b = jax.random.split(key, 4)
    nf = fcfg.n_feats
    params = {
        "vit": vit_lib.vit_init(kv, fcfg.vit, dtype),
        "cluster1": conv1x1_init(k1, nf, fcfg.dim, dtype),
    }
    if fcfg.projection_type == "nonlinear":
        params["cluster2"] = {
            "fc1": conv1x1_init(k2a, nf, nf, dtype),
            "fc2": conv1x1_init(k2b, nf, fcfg.dim, dtype),
        }
    return params


def _tokens_to_grid(feat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, 1+HW, C] -> [B, C, H, W] (drop cls, row-major reshape)."""
    b = feat.shape[0]
    return jnp.transpose(feat[:, 1:].reshape(b, h, w, -1), (0, 3, 1, 2))


def backbone_features(params: dict, img: jnp.ndarray, fcfg: FeaturizerConfig,
                      precision: str | None = None, need_attn: bool = False,
                      backbone_dtype: str | None = None):
    """Frozen-backbone dense features [B, C, H/ps, W/ps] plus last-block attn.

    ``need_attn=False`` (the default — LHP attn propagation is the only
    consumer) lets "auto" pick the flash path, under which ``attn`` is None.

    ``backbone_dtype="bfloat16"`` runs the frozen ViT in bf16 (params cast at
    trace time, outputs returned f32): the backbone is stop-gradient feature
    extraction, so this halves its HBM traffic/time (~2x measured on v5e) at
    ~1% feature deviation; keep the f32 default for parity runs.
    ``backbone_dtype="int8"`` additionally runs every block linear as a w8a8
    int8 MXU matmul (2x bf16 peak) — a coarser approximation (opt-in).
    """
    vcfg = fcfg.vit
    assert img.shape[2] % vcfg.patch_size == 0 and img.shape[3] % vcfg.patch_size == 0
    fh = img.shape[2] // vcfg.patch_size
    fw = img.shape[3] // vcfg.patch_size

    if backbone_dtype not in (None, "float32", "bfloat16", "int8"):
        raise ValueError(f"unknown backbone_dtype {backbone_dtype!r}; "
                         "expected float32 | bfloat16 | int8")
    vit_params = params["vit"]
    if backbone_dtype == "bfloat16":
        vit_params = cast_tree_bf16(vit_params)
        img = img.astype(jnp.bfloat16)
    elif backbone_dtype == "int8":
        # w8a8 block linears, bf16 everything else (vit.quantize_vit_params):
        # 2x MXU peak on the matmuls that dominate the frozen forwards. Like
        # bf16, an approximation of the f32 reference — characterized in
        # tests/test_int8_backbone.py; opt-in, never the parity path.
        vit_params = vit_lib.quantize_vit_params(vit_params)
        img = img.astype(jnp.bfloat16)
    impl = vit_lib.resolve_attn_impl(fcfg.attention_impl, need_attn, precision)
    feats, attns, qkvs = vit_lib.vit_apply(vit_params, img, vcfg, n=1,
                                           precision=precision, attn_impl=impl)
    feat, attn, qkv = feats[0], attns[0], qkvs[0]
    if backbone_dtype in ("bfloat16", "int8"):
        feat = feat.astype(jnp.float32)
        qkv = qkv.astype(jnp.float32)
        if attn is not None:
            attn = attn.astype(jnp.float32)

    if fcfg.feat_type == "feat":
        image_feat = _tokens_to_grid(feat, fh, fw)
    elif fcfg.feat_type == "KK":
        # per-head keys of the last block, heads folded into channels
        k = qkv[1][:, :, 1:, :]  # [B, h, HW, hd]
        b, nh, _, hd = k.shape
        k = k.reshape(b, nh, fh, fw, hd)
        image_feat = jnp.transpose(k, (0, 1, 4, 2, 3)).reshape(b, nh * hd, fh, fw)
    else:
        raise ValueError(f"Unknown feat type: {fcfg.feat_type}")

    image_feat = jax.lax.stop_gradient(image_feat)
    if attn is not None:
        attn = jax.lax.stop_gradient(attn)
    return image_feat, attn


def project(params: dict, image_feat: jnp.ndarray, fcfg: FeaturizerConfig,
            key: jax.Array | None, train: bool) -> jnp.ndarray:
    """cluster1(drop(x)) [+ cluster2(drop(x))] with independent dropout masks."""
    if fcfg.projection_type is None:
        return image_feat
    enabled = train and key is not None
    k1, k2 = jax.random.split(key) if key is not None else (None, None)
    code = conv1x1(params["cluster1"], dropout2d(k1, image_feat, fcfg.drop_rate, enabled))
    if fcfg.projection_type == "nonlinear":
        h = dropout2d(k2, image_feat, fcfg.drop_rate, enabled)
        h = conv1x1(params["cluster2"]["fc1"], h)
        h = jax.nn.relu(h)
        code = code + conv1x1(params["cluster2"]["fc2"], h)
    return code


def dispatch_apply(params: dict, img: jnp.ndarray, fcfg: FeaturizerConfig,
                   depth=None, key: jax.Array | None = None, train: bool = False,
                   precision: str | None = None, need_attn: bool = False,
                   backbone_dtype: str | None = None):
    """Arch-aware featurizer apply: routes DepthFeaturizerConfig to the
    depth-fused forward (its eval path uses the no-depth embed), everything
    else to the plain featurizer. The single dispatch point for train,
    validation and TTA eval."""
    from depthg_tpu.models.featurizer_depth import (
        DepthFeaturizerConfig,
        depth_featurizer_apply,
    )
    from depthg_tpu.models.pyramid import PyramidConfig, pyramid_featurizer_apply

    if isinstance(fcfg, PyramidConfig):
        # arch="feature-pyramid" (reference src/train_segmentation.py:99-101):
        # frozen ResNet + trainable pyramid head; depth/attn/dropout unused.
        # The convs follow input dtype, so there is no separate matmul
        # `precision` knob here — bf16 vs f32 is the whole choice.
        return pyramid_featurizer_apply(params, img, fcfg, train=train,
                                        backbone_dtype=backbone_dtype)
    if isinstance(fcfg, DepthFeaturizerConfig):
        return depth_featurizer_apply(params, img, fcfg, depth=depth, key=key,
                                      train=train, precision=precision,
                                      need_attn=need_attn,
                                      backbone_dtype=backbone_dtype)
    return featurizer_apply(params, img, fcfg, key=key, train=train,
                            precision=precision, need_attn=need_attn,
                            backbone_dtype=backbone_dtype)


def featurizer_apply(params: dict, img: jnp.ndarray, fcfg: FeaturizerConfig,
                     key: jax.Array | None = None, train: bool = False,
                     precision: str | None = None, need_attn: bool = False,
                     backbone_dtype: str | None = None):
    """Full featurizer. Returns dict(feats, code, attn).

    In train mode with ``fcfg.dropout`` the returned ``feats`` carry their own
    dropout mask, mirroring reference ``src/modules.py:128-137``.
    """
    image_feat, attn = backbone_features(params, img, fcfg, precision, need_attn,
                                         backbone_dtype)
    if key is not None:
        kp, kf = jax.random.split(key)
    else:
        kp = kf = None
    with vit_lib.matmul_precision(precision):
        code = project(params, image_feat, fcfg, kp, train)
    feats_out = image_feat
    if fcfg.dropout:
        feats_out = dropout2d(kf, image_feat, fcfg.drop_rate, train and kf is not None)
    return {"feats": feats_out, "code": code, "attn": attn}
