"""Checkpoint interop: torch (DINO .pth / Lightning .ckpt) <-> JAX pytrees.

The reference stores everything in torch formats:
* DINO backbone weights (torch hub .pth state dicts; optionally wrapped in a
  {"teacher": ...} dict with ``module.``/``backbone.`` prefixes — reference
  ``src/modules.py:52-68``),
* full training state as a PyTorch-Lightning ``.ckpt`` whose state_dict uses
  the ``net.model.*`` / ``net.cluster1.*`` / ``linear_probe.*`` /
  ``cluster_probe.clusters`` key layout (reference
  ``src/train_segmentation.py:110-147``).

These converters are host-side, numpy-only transforms (torch is imported
lazily and used purely as a deserializer); the resulting pytrees feed straight
into the jitted TPU programs. Linear/conv weights are transposed into matmul
layout ([in, out]) at conversion time.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _linear(sd: dict, prefix: str) -> dict:
    out = {"w": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["b"] = _np(sd[prefix + ".bias"])
    else:
        out["b"] = np.zeros(out["w"].shape[1], out["w"].dtype)
    return out


def _layer_norm(sd: dict, prefix: str) -> dict:
    return {"g": _np(sd[prefix + ".weight"]), "b": _np(sd[prefix + ".bias"])}


def _conv1x1(sd: dict, prefix: str) -> dict:
    w = _np(sd[prefix + ".weight"])  # [out, in, 1, 1]
    return {"w": w[:, :, 0, 0].T, "b": _np(sd[prefix + ".bias"])}


def strip_prefixes(sd: dict, prefixes=("module.", "backbone.")) -> dict:
    out = {}
    for k, v in sd.items():
        for p in prefixes:
            k = k.replace(p, "")
        out[k] = v
    return out


def vit_params_from_torch(sd: dict) -> dict:
    """DINO ViT state dict -> depthg_tpu vit param pytree."""
    n_blocks = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("blocks."))
    pw = _np(sd["patch_embed.proj.weight"])  # [D, 3, ps, ps]
    d = pw.shape[0]
    params: dict[str, Any] = {
        "patch_embed": {"w": pw.reshape(d, -1).T, "b": _np(sd["patch_embed.proj.bias"])},
        "cls_token": _np(sd["cls_token"]),
        "pos_embed": _np(sd["pos_embed"]),
        "norm": _layer_norm(sd, "norm"),
        "blocks": [],
    }
    for i in range(n_blocks):
        p = f"blocks.{i}"
        params["blocks"].append({
            "norm1": _layer_norm(sd, p + ".norm1"),
            "qkv": _linear(sd, p + ".attn.qkv"),
            "proj": _linear(sd, p + ".attn.proj"),
            "norm2": _layer_norm(sd, p + ".norm2"),
            "fc1": _linear(sd, p + ".mlp.fc1"),
            "fc2": _linear(sd, p + ".mlp.fc2"),
        })
    return params


def load_dino_pth(path: str) -> dict:
    """Load a DINO pretrain .pth (optionally a {"teacher": ...} wrapper)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "teacher" in sd:
        sd = strip_prefixes(sd["teacher"])
    return vit_params_from_torch(sd)


def segmenter_params_from_lightning(state_dict: dict) -> dict:
    """Lightning ``.ckpt`` state_dict -> full segmenter param pytree.

    Produces {"net": {"vit", "cluster1"[, "cluster2"]}, "linear_probe",
    "cluster_probe", "decoder"} matching this framework's module layout.
    """
    sd = dict(state_dict)
    vit_sd = {k[len("net.model."):]: v for k, v in sd.items() if k.startswith("net.model.")}
    net: dict[str, Any] = {"vit": vit_params_from_torch(vit_sd)}
    if "net.cluster1.0.weight" in sd:
        net["cluster1"] = _conv1x1(sd, "net.cluster1.0")
    if "net.cluster2.0.weight" in sd:
        net["cluster2"] = {
            "fc1": _conv1x1(sd, "net.cluster2.0"),
            "fc2": _conv1x1(sd, "net.cluster2.2"),
        }
    out: dict[str, Any] = {"net": net}
    if "linear_probe.weight" in sd:
        out["linear_probe"] = _conv1x1(sd, "linear_probe") if sd["linear_probe.weight"].ndim == 4 \
            else _linear(sd, "linear_probe")
    if "cluster_probe.clusters" in sd:
        out["cluster_probe"] = {"clusters": _np(sd["cluster_probe.clusters"])}
    if "decoder.weight" in sd:
        out["decoder"] = _conv1x1(sd, "decoder")
    return out


def load_lightning_ckpt(path: str):
    """Returns (params pytree, hparams cfg dict or None)."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    hparams = blob.get("hyper_parameters") or blob.get("hparams") or None
    if hparams is not None and not isinstance(hparams, dict):
        try:  # OmegaConf DictConfig in reference checkpoints
            hparams = dict(hparams)
        except Exception:
            hparams = None
    if isinstance(hparams, dict) and "cfg" in hparams:
        cfg = hparams["cfg"]
        hparams = {k: cfg[k] for k in cfg} if not isinstance(cfg, dict) else cfg
    return segmenter_params_from_lightning(blob["state_dict"]), hparams


# ---------------------------------------------------------------------------
# Export: JAX pytree -> reference Lightning ``.ckpt`` (inverse of the loaders
# above; SURVEY.md §7 step 7). The written file uses the exact key layout of
# the reference ``LitUnsupervisedSegmenter`` (``src/train_segmentation.py:
# 110-147``) so the reference's own ``eval_segmentation.py:88`` /
# ``load_from_checkpoint`` can consume checkpoints trained by this framework.
# ---------------------------------------------------------------------------


def _torch(a):
    import torch

    return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))


def _linear_sd(out: dict, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _torch(np.asarray(p["w"]).T)
    out[prefix + ".bias"] = _torch(p["b"])


def _conv1x1_sd(out: dict, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _torch(np.asarray(p["w"]).T[:, :, None, None])
    out[prefix + ".bias"] = _torch(p["b"])


def _layer_norm_sd(out: dict, prefix: str, p: dict) -> None:
    out[prefix + ".weight"] = _torch(p["g"])
    out[prefix + ".bias"] = _torch(p["b"])


def vit_state_dict(params: dict, prefix: str = "") -> dict:
    """depthg_tpu vit param pytree -> DINO ViT torch state dict."""
    out: dict[str, Any] = {}
    pw = np.asarray(params["patch_embed"]["w"])  # [3*ps*ps, D], (c, kh, kw) order
    d = pw.shape[1]
    ps = int(round((pw.shape[0] // 3) ** 0.5))
    out[prefix + "patch_embed.proj.weight"] = _torch(pw.T.reshape(d, 3, ps, ps))
    out[prefix + "patch_embed.proj.bias"] = _torch(params["patch_embed"]["b"])
    out[prefix + "cls_token"] = _torch(params["cls_token"])
    out[prefix + "pos_embed"] = _torch(params["pos_embed"])
    _layer_norm_sd(out, prefix + "norm", params["norm"])
    for i, blk in enumerate(params["blocks"]):
        p = f"{prefix}blocks.{i}"
        _layer_norm_sd(out, p + ".norm1", blk["norm1"])
        _linear_sd(out, p + ".attn.qkv", blk["qkv"])
        _linear_sd(out, p + ".attn.proj", blk["proj"])
        _layer_norm_sd(out, p + ".norm2", blk["norm2"])
        _linear_sd(out, p + ".mlp.fc1", blk["fc1"])
        _linear_sd(out, p + ".mlp.fc2", blk["fc2"])
    return out


def lightning_state_dict(params: dict) -> dict:
    """Full segmenter param pytree -> reference Lightning state_dict."""
    net = params["net"]
    sd = vit_state_dict(net["vit"], prefix="net.model.")
    if "cluster1" in net:
        _conv1x1_sd(sd, "net.cluster1.0", net["cluster1"])
    if "cluster2" in net:
        _conv1x1_sd(sd, "net.cluster2.0", net["cluster2"]["fc1"])
        _conv1x1_sd(sd, "net.cluster2.2", net["cluster2"]["fc2"])
    if "linear_probe" in params:
        _conv1x1_sd(sd, "linear_probe", params["linear_probe"])
    if "cluster_probe" in params:
        sd["cluster_probe.clusters"] = _torch(params["cluster_probe"]["clusters"])
    if "decoder" in params and params["decoder"] is not None:
        # the inline rec-loss decoder (reference train_segmentation.py:115)
        _conv1x1_sd(sd, "decoder", params["decoder"])
    return sd


def export_lightning_ckpt(path: str, params, cfg: dict | None = None,
                          n_classes: int | None = None, global_step: int = 0,
                          epoch: int = 0) -> None:
    """Write a reference-compatible Lightning ``.ckpt``.

    ``cfg`` should be the reference-style run config (the hparams the
    reference's ``save_hyperparameters()`` would have captured); ``n_classes``
    defaults to the linear probe's output dim.
    """
    import torch

    host = jax_to_numpy(params)
    if n_classes is None and "linear_probe" in host:
        n_classes = int(np.asarray(host["linear_probe"]["w"]).shape[1])
    blob = {
        "epoch": epoch,
        "global_step": global_step,
        "pytorch-lightning_version": "1.9.0",
        "state_dict": lightning_state_dict(host),
        "hyper_parameters": {"n_classes": n_classes, "cfg": dict(cfg or {})},
        "loops": {},
        "callbacks": {},
        "optimizer_states": [],
        "lr_schedulers": [],
    }
    torch.save(blob, path)


def jax_to_numpy(tree):
    """Device pytree -> host numpy (f32 for float dtypes, incl. bf16)."""

    def conv(x):
        if hasattr(x, "dtype") and hasattr(x, "__array__"):
            a = np.asarray(x)
            if a.dtype.kind == "V" or str(a.dtype) == "bfloat16":
                a = a.astype(np.float32)
            return a
        return x

    try:
        import jax

        return jax.tree_util.tree_map(conv, tree)
    except ImportError:
        return tree


def to_jax(tree, dtype=None):
    """numpy pytree -> device arrays (optionally casting floats)."""
    import jax.numpy as jnp

    def conv(x):
        if isinstance(x, np.ndarray):
            arr = jnp.asarray(x)
            if dtype is not None and np.issubdtype(x.dtype, np.floating):
                arr = arr.astype(dtype)
            return arr
        return x

    import jax
    return jax.tree_util.tree_map(conv, tree)
