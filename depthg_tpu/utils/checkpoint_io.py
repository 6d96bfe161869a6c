"""Unified checkpoint IO: reference Lightning ``.ckpt`` files and native
orbax directories both load into the canonical segmenter param layout."""

from __future__ import annotations

import os

import numpy as np

from depthg_tpu.config import Config
from depthg_tpu.models.featurizer import FeaturizerConfig
from depthg_tpu.utils import ckpt as torch_ckpt


def fcfg_from_run_cfg(cfg) -> FeaturizerConfig:
    """Arch-aware featurizer config: ``arch=dino_depth`` checkpoints must
    evaluate through the depth-fused forward (its eval path uses the learned
    no-depth embedding), so the returned config type carries the dispatch."""
    kwargs = dict(
        arch=cfg.get("model_type", "vit_small"),
        patch_size=int(cfg.get("dino_patch_size", 8)),
        feat_type=cfg.get("dino_feat_type", "feat"),
        projection_type=cfg.get("projection_type", "nonlinear"),
        dim=int(cfg.get("dim", 70)),
        dropout=bool(cfg.get("dropout", True)),
        attention_impl=str(cfg.get("attention_impl", "auto")),
    )
    if cfg.get("arch") == "dino_depth":
        from depthg_tpu.models.featurizer_depth import DepthFeaturizerConfig

        return DepthFeaturizerConfig(guidance=str(cfg.get("guidance", "none")),
                                     **kwargs)
    if cfg.get("arch") == "feature-pyramid":
        # reference src/train_segmentation.py:99-101: FeaturePyramidNet over a
        # frozen load_model backbone (resnet50-family channel layout)
        from depthg_tpu.models.pyramid import PyramidConfig

        return PyramidConfig(granularity=int(cfg.get("granularity", 1)),
                             dim=int(cfg.get("dim", 70)),
                             continuous=bool(cfg.get("continuous", True)))
    return FeaturizerConfig(**kwargs)


def load_segmenter(path: str):
    """Returns (params, run_cfg: Config). Accepts:
    * a Lightning ``.ckpt`` from the reference (hparams embedded),
    * a native orbax checkpoint directory written by ``save_native``.
    """
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        blob = ckptr.restore(os.path.abspath(path))
        params = blob["params"]
        cfg = Config(blob.get("cfg", {}))
        return params, cfg
    params, hparams = torch_ckpt.load_lightning_ckpt(path)
    return torch_ckpt.to_jax(params), Config(hparams or {})


def ecfg_from_checkpoint(cfg, params, run_cfg, n_classes: int | None = None,
                         extra_clusters: int | None = None):
    """EvalConfig from a loaded checkpoint + CLI cfg — the ONE construction
    shared by the demo, serve, and eval surfaces. ``n_classes`` /
    ``extra_clusters`` default to the checkpoint's own shape (cluster rows
    beyond ``run_cfg.n_classes`` are extras); eval passes the dataset's
    values explicitly."""
    from depthg_tpu.inference import EvalConfig
    from depthg_tpu.ops.crf import crf_config_from_cfg

    if n_classes is None:
        n_classes = int(run_cfg.get("n_classes", 27))
    if extra_clusters is None:
        rows = params["cluster_probe"]["clusters"].shape[0]
        extra_clusters = rows - n_classes if rows > n_classes else 0
    return EvalConfig(
        n_classes=int(n_classes), extra_clusters=int(extra_clusters),
        run_crf=bool(cfg.run_crf), label_res=int(cfg.res),
        crf=crf_config_from_cfg(cfg),
        precision=cfg.get("matmul_precision"),
        # bf16 default: ~30% faster eval; probe-argmax agreement vs f32 and
        # mIoU deltas quantified in docs/BF16_TRAIN_STUDY.md (eval-path arm)
        backbone_dtype=str(cfg.get("backbone_dtype", "bfloat16")),
        fused_tta=bool(cfg.get("fused_tta", True)),
    )


def save_native(path: str, params, cfg: Config | dict, extra: dict | None = None):
    """Write an orbax checkpoint with params + run cfg (+ optimizer extras)."""
    import orbax.checkpoint as ocp

    blob = {"params": _to_numpy(params), "cfg": dict(cfg)}
    if extra:
        blob.update(_to_numpy(extra))
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path), blob, force=True)


def _to_numpy(tree):
    import jax

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)
