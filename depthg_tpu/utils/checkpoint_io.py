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
