"""ZoeD_M12_N.pt (torch) -> depthg_tpu ZoeDepth param pytree.

Key layout of the released checkpoint (model state under ``model`` or raw):
* ``core.core.pretrained.model.*`` — timm BEiT-L (patch_embed.proj, blocks.N.
  {norm1, attn.{qkv.weight, q_bias, v_bias, proj, relative_position_bias_table},
  norm2, mlp.fc1/fc2, gamma_1, gamma_2}, cls_token)
* ``core.core.pretrained.act_postprocess{1..4}.*`` or
  ``core.core.pretrained.model.*``/hook-projection variants depending on the
  MiDaS version — handled via suffix search;
* ``core.core.scratch.{layer{1..4}_rn, refinenet{1..4}, output_conv}``
* head: ``conv2``, ``seed_bin_regressor._net``, ``seed_projector._net``,
  ``projectors.N._net``, ``attractors.N._net``, ``conditional_log_binomial.mlp``

Zero-egress note: the checkpoint cannot be downloaded in this environment;
this converter is exercised against synthetic state dicts shaped like the
release in tests, and against the real file when one is provided on disk.
"""

from __future__ import annotations

import re

import numpy as np


def _np(t):
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _find(sd: dict, suffix: str):
    hits = [k for k in sd if k.endswith(suffix)]
    if not hits:
        raise KeyError(suffix)
    if len(hits) > 1:
        hits.sort(key=len)
    return _np(sd[hits[0]])


def _conv(sd, prefix):
    p = {"w": _find(sd, prefix + ".weight")}
    try:
        p["b"] = _find(sd, prefix + ".bias")
    except KeyError:
        pass
    return p


def _mlp2(sd, prefix):
    return [_conv(sd, f"{prefix}.0"), _conv(sd, f"{prefix}.2")]


def _ln(sd, prefix):
    return {"g": _find(sd, prefix + ".weight"), "b": _find(sd, prefix + ".bias")}


def _linear_t(sd, prefix):
    return {"w": _find(sd, prefix + ".weight").T, "b": _find(sd, prefix + ".bias")}


def beit_params_from_torch(sd: dict) -> dict:
    n_blocks = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.search(r"blocks\.(\d+)\.attn\.qkv\.weight$", k)))
    pw = _find(sd, "patch_embed.proj.weight")  # [D, 3, 16, 16]
    d = pw.shape[0]
    params = {
        "patch_embed": {"w": pw.reshape(d, -1).T,
                        "b": _find(sd, "patch_embed.proj.bias")},
        "cls_token": _find(sd, "cls_token"),
        "blocks": [],
    }
    for i in range(n_blocks):
        p = f"blocks.{i}"
        params["blocks"].append({
            "norm1": _ln(sd, p + ".norm1"),
            "qkv_w": _find(sd, p + ".attn.qkv.weight").T,
            "q_bias": _find(sd, p + ".attn.q_bias"),
            "v_bias": _find(sd, p + ".attn.v_bias"),
            "proj": _linear_t(sd, p + ".attn.proj"),
            "norm2": _ln(sd, p + ".norm2"),
            "fc1": _linear_t(sd, p + ".mlp.fc1"),
            "fc2": _linear_t(sd, p + ".mlp.fc2"),
            "gamma_1": _find(sd, p + ".gamma_1"),
            "gamma_2": _find(sd, p + ".gamma_2"),
            "rel_pos_table": _find(sd, p + ".attn.relative_position_bias_table"),
        })
    return params


def dpt_params_from_torch(sd: dict) -> dict:
    params: dict = {"readout": [], "reassemble": [], "rn": [], "fusion": []}
    for i in range(1, 5):
        # MiDaS 3.x: pretrained.act_postprocess{i} = Sequential(readout_oper,
        # Transpose..., conv1x1 project[, resample]). readout_oper variants
        # (isl-org/MiDaS vit.py): ProjectReadout -> ".0.project.0.{weight,bias}";
        # Slice/AddReadout -> parameter-free (no keys).
        try:
            ro = f"act_postprocess{i}.0.project.0"
            params["readout"].append({"w": _find(sd, ro + ".weight").T,
                                      "b": _find(sd, ro + ".bias")})
        except KeyError:
            params["readout"].append(None)  # slice/add readout: no params
        params["reassemble"].append({"project": _conv(sd, f"act_postprocess{i}.3")})
    params["reassemble"][0]["resample"] = _conv(sd, "act_postprocess1.4")
    params["reassemble"][1]["resample"] = _conv(sd, "act_postprocess2.4")
    params["reassemble"][3]["resample"] = _conv(sd, "act_postprocess4.4")
    for i in range(1, 5):
        params["rn"].append(_conv(sd, f"scratch.layer{i}_rn"))

    def rcu(prefix):
        return {"conv1": _conv(sd, prefix + ".conv1"),
                "conv2": _conv(sd, prefix + ".conv2")}

    for i, rid in enumerate([4, 3, 2, 1]):
        params["fusion"].append({
            "rcu1": rcu(f"refinenet{rid}.resConfUnit1"),
            "rcu2": rcu(f"refinenet{rid}.resConfUnit2"),
            "out": _conv(sd, f"refinenet{rid}.out_conv"),
        })
    params["head"] = {
        "conv1": _conv(sd, "output_conv.0"),
        "conv2": _conv(sd, "output_conv.2"),
        "conv3": _conv(sd, "output_conv.4"),
    }
    return params


def zoe_params_from_torch(state_dict: dict) -> dict:
    sd = state_dict.get("model", state_dict)
    # DataParallel/DDP saves prefix every key with "module."
    # (reference src/zoedepth/models/model_io.py:40-44)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    n_stages = 1 + max(int(m.group(1)) for k in sd
                       if (m := re.search(r"projectors\.(\d+)\._net", k)))
    params = {
        "beit": beit_params_from_torch(
            {k: v for k, v in sd.items() if "pretrained.model." in k}),
        "dpt": dpt_params_from_torch(
            {k: v for k, v in sd.items()
             if ".scratch." in k or "act_postprocess" in k}),
        "conv2": _conv(sd, "conv2"),
        "seed_bin_regressor": _mlp2(sd, "seed_bin_regressor._net"),
        "seed_projector": _mlp2(sd, "seed_projector._net"),
        "projectors": [_mlp2(sd, f"projectors.{i}._net") for i in range(n_stages)],
        "attractors": [_mlp2(sd, f"attractors.{i}._net") for i in range(n_stages)],
        "conditional_log_binomial": _mlp2(sd, "conditional_log_binomial.mlp"),
    }
    return params


def zoe_config_from_params(params: dict):
    """Derive a ZoeConfig from converted parameter shapes — makes the loader
    robust to released-checkpoint variants (ZoeD-S/M/L, different bin counts)
    without hardcoding the M12_N layout."""
    from depthg_tpu.models.zoedepth.beit import BEiTConfig
    from depthg_tpu.models.zoedepth.dpt import DPTConfig
    from depthg_tpu.models.zoedepth.model import ZoeConfig

    bp = params["beit"]
    depth = len(bp["blocks"])
    embed_dim = bp["patch_embed"]["w"].shape[1]
    heads = bp["blocks"][0]["rel_pos_table"].shape[1]
    # table rows = (2w-1)^2 + 3 (3 extra cls-relative entries, timm BEiT)
    window = (int(round((bp["blocks"][0]["rel_pos_table"].shape[0] - 3) ** 0.5)) + 1) // 2
    hooks = (depth // 4 - 1, depth // 2 - 1, 3 * depth // 4 - 1, depth - 1)

    dp = params["dpt"]
    dpt_cfg = DPTConfig(
        embed_dim=embed_dim,
        features=dp["rn"][0]["w"].shape[0],
        reassemble_channels=tuple(r["project"]["w"].shape[0] for r in dp["reassemble"]),
    )
    n_bins = params["seed_bin_regressor"][-1]["w"].shape[0]
    bin_dim = params["seed_projector"][-1]["w"].shape[0]
    n_attractors = tuple(a[-1]["w"].shape[0] for a in params["attractors"])
    return ZoeConfig(
        n_bins=n_bins, bin_embedding_dim=bin_dim, n_attractors=n_attractors,
        beit=BEiTConfig(embed_dim=embed_dim, depth=depth, num_heads=heads,
                        pretrain_window=window, hooks=hooks),
        dpt=dpt_cfg, n_midas_out=params["conv2"]["w"].shape[0],
    )


def load_zoedepth_pt(path: str, with_config: bool = False):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "model" in blob:
        blob = blob["model"]
    params = zoe_params_from_torch(blob)
    if with_config:
        return params, zoe_config_from_params(params)
    return params
