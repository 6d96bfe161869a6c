"""ZoeDepth config system: ``get_config(model, mode, **overrides)``.

Mirrors the reference's JSON config stack (``src/zoedepth/utils/config.py``:
COMMON_CONFIG + per-model/per-mode blocks + kwargs overrides) mapped onto this
framework's typed ``ZoeConfig`` / ``ZoeNKConfig`` dataclasses. The shipped
defaults reproduce ``config_zoedepth.json`` "infer" (the mode the DepthG
pipelines use).
"""

from __future__ import annotations

from typing import Any

from depthg_tpu.models.zoedepth.model import ZoeConfig
from depthg_tpu.models.zoedepth.nk import BinConf, ZoeNKConfig

# config_zoedepth.json "model" block (reference values)
ZOEDEPTH_MODEL_CONFIG = {
    "n_bins": 64,
    "bin_embedding_dim": 128,
    "bin_centers_type": "softplus",
    "n_attractors": (16, 8, 4, 1),
    "attractor_alpha": 1000.0,
    "attractor_gamma": 2.0,
    "attractor_kind": "mean",
    "attractor_type": "inv",
    "min_temp": 0.0212,
    "max_temp": 50.0,
    "inverse_midas": False,
    "img_size": (384, 512),
}

# config_zoedepth_nk.json "model" block
ZOEDEPTH_NK_MODEL_CONFIG = {
    "bin_conf": (
        {"name": "nyu", "n_bins": 64, "min_depth": 1e-3, "max_depth": 10.0},
        {"name": "kitti", "n_bins": 64, "min_depth": 1e-3, "max_depth": 80.0},
    ),
    "bin_embedding_dim": 128,
    "bin_centers_type": "softplus",
    "n_attractors": (16, 8, 4, 1),
    "attractor_alpha": 1000.0,
    "attractor_gamma": 2.0,
    "attractor_kind": "mean",
    "attractor_type": "inv",
    "min_temp": 0.0212,
    "max_temp": 50.0,
}

PRETRAINED_RESOURCES = {
    # "infer"/"eval" pretrained checkpoints (reference config_zoedepth*.json)
    "zoedepth": "https://github.com/isl-org/ZoeDepth/releases/download/v1.0/ZoeD_M12_N.pt",
    "zoedepth_nk": "https://github.com/isl-org/ZoeDepth/releases/download/v1.0/ZoeD_M12_NK.pt",
}


def get_config(model_name: str = "zoedepth", mode: str = "infer",
               **overwrite_kwargs: Any):
    """Returns the typed config for ``model_name`` with overrides applied."""
    if model_name not in ("zoedepth", "zoedepth_nk"):
        raise ValueError(f"Model {model_name} not in ['zoedepth', 'zoedepth_nk']")
    if mode not in ("train", "infer", "eval"):
        raise ValueError(f"Mode {mode} not in ['train', 'infer', 'eval']")

    if model_name == "zoedepth":
        cfg = dict(ZOEDEPTH_MODEL_CONFIG)
        cfg.update({k: v for k, v in overwrite_kwargs.items() if k in cfg})
        if isinstance(cfg["n_attractors"], list):
            cfg["n_attractors"] = tuple(cfg["n_attractors"])
        if isinstance(cfg["img_size"], (list, int)):
            s = cfg["img_size"]
            cfg["img_size"] = (s, s) if isinstance(s, int) else tuple(s)
        return ZoeConfig(**cfg)

    cfg = dict(ZOEDEPTH_NK_MODEL_CONFIG)
    cfg.update({k: v for k, v in overwrite_kwargs.items() if k in cfg})
    bin_confs = tuple(BinConf(c["name"], int(c["n_bins"]),
                              float(c["min_depth"]), float(c["max_depth"]))
                      for c in cfg.pop("bin_conf"))
    cfg.pop("bin_centers_type", None)
    return ZoeNKConfig(bin_confs=bin_confs,
                       bin_embedding_dim=int(cfg["bin_embedding_dim"]),
                       n_attractors=tuple(cfg["n_attractors"]),
                       attractor_alpha=float(cfg["attractor_alpha"]),
                       attractor_gamma=float(cfg["attractor_gamma"]),
                       attractor_kind=cfg["attractor_kind"],
                       attractor_type=cfg["attractor_type"],
                       min_temp=float(cfg["min_temp"]),
                       max_temp=float(cfg["max_temp"]))
