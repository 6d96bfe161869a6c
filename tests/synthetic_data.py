"""Helpers to build tiny on-disk synthetic datasets for end-to-end tests."""

import os
from os.path import join

import numpy as np
from PIL import Image


def make_cropped_dataset(root, dataset_name="cocostuff27", crop_type="five",
                         crop_ratio=0.5, n=10, size=64, n_classes=27,
                         splits=("train", "val"), with_depth=True, seed=0):
    """Create a cropped/{ds}_{crop}_crop_{ratio}/ tree like crop_datasets emits."""
    rng = np.random.default_rng(seed)
    base = join(root, "cropped", f"{dataset_name}_{crop_type}_crop_{crop_ratio}")
    for split in splits:
        for sub in ("img", "label", "depth"):
            os.makedirs(join(base, sub, split), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(join(base, "img", split, f"{i}.jpg"))
            # stored labels are shifted +1 (0 = ignore)
            label = rng.integers(0, n_classes + 1, (size, size)).astype(np.uint8)
            Image.fromarray(label).save(join(base, "label", split, f"{i}.png"))
            if with_depth:
                depth = rng.integers(0, 255, (size, size), np.uint8)
                Image.fromarray(depth).save(join(base, "depth", split, f"{i}_zoedepth.png"))
    return base


def make_nns(root, model_type, dataset_name, image_set, crop_type, res, n,
             n_neighbors=30, seed=0):
    """Write an nns_*.npz with plausible nearest-neighbor indices."""
    rng = np.random.default_rng(seed)
    os.makedirs(join(root, "nns"), exist_ok=True)
    nns = np.stack([
        np.concatenate([[i], rng.choice(np.delete(np.arange(n), i),
                                        n_neighbors - 1, replace=n - 1 < n_neighbors - 1)])
        for i in range(n)])
    path = join(root, "nns", f"nns_{model_type}_{dataset_name}_{image_set}_{crop_type}_{res}.npz")
    np.savez_compressed(path, nns=nns)
    return path


def make_directory_dataset(root, n=6, size=48, n_classes=5, seed=0):
    rng = np.random.default_rng(seed)
    for split in ("train", "val"):
        os.makedirs(join(root, "imgs", split), exist_ok=True)
        os.makedirs(join(root, "labels", split), exist_ok=True)
        for i in range(n):
            img = rng.integers(0, 255, (size, size, 3), np.uint8)
            Image.fromarray(img).save(join(root, "imgs", split, f"{i:03d}.jpg"))
            label = rng.integers(0, n_classes, (size, size)).astype(np.uint8)
            Image.fromarray(label).save(join(root, "labels", split, f"{i:03d}.png"))
    return root


def dpt_torch_state_dict(dp, scratch="scratch.", post="pretrained.act_postprocess"):
    """MiDaS DPT decoder params -> torch-hub-shaped state dict fragment
    (shared by the ZoeDepth core layout and the standalone DPT_Large layout,
    which differ only in key prefixes)."""
    import torch

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    sd = {}
    for i in range(4):
        if dp["readout"][i] is not None:
            sd[f"{post}{i+1}.0.project.0.weight"] = t(np.asarray(dp["readout"][i]["w"]).T)
            sd[f"{post}{i+1}.0.project.0.bias"] = t(dp["readout"][i]["b"])
        sd[f"{post}{i+1}.3.weight"] = t(dp["reassemble"][i]["project"]["w"])
        sd[f"{post}{i+1}.3.bias"] = t(dp["reassemble"][i]["project"]["b"])
    for i in (0, 1, 3):
        sd[f"{post}{i+1}.4.weight"] = t(dp["reassemble"][i]["resample"]["w"])
        sd[f"{post}{i+1}.4.bias"] = t(dp["reassemble"][i]["resample"]["b"])
    for i in range(4):
        sd[f"{scratch}layer{i+1}_rn.weight"] = t(dp["rn"][i]["w"])
    for j, rid in enumerate([4, 3, 2, 1]):
        fu = dp["fusion"][j]
        for name, rcu in (("resConfUnit1", fu["rcu1"]), ("resConfUnit2", fu["rcu2"])):
            for cname in ("conv1", "conv2"):
                sd[f"{scratch}refinenet{rid}.{name}.{cname}.weight"] = t(rcu[cname]["w"])
                sd[f"{scratch}refinenet{rid}.{name}.{cname}.bias"] = t(rcu[cname]["b"])
        sd[f"{scratch}refinenet{rid}.out_conv.weight"] = t(fu["out"]["w"])
        sd[f"{scratch}refinenet{rid}.out_conv.bias"] = t(fu["out"]["b"])
    for i, name in ((0, "output_conv.0"), (2, "output_conv.2"), (4, "output_conv.4")):
        hp = dp["head"][f"conv{i//2+1}"]
        sd[f"{scratch}{name}.weight"] = t(hp["w"])
        sd[f"{scratch}{name}.bias"] = t(hp["b"])
    return sd


def zoe_torch_state_dict(params, cfg, module_prefix=False):
    """Build a released-checkpoint-shaped torch state dict from depthg_tpu
    ZoeDepth params (key layout of ZoeD_M12_N.pt; see models/zoedepth/convert).
    ``module_prefix`` adds the DataParallel "module." prefix variant."""
    import torch

    sd = {}
    mp = "module." if module_prefix else ""
    pre = mp + "core.core.pretrained.model."
    bp = params["beit"]
    d = cfg.beit.embed_dim

    def t(a):
        return torch.from_numpy(np.ascontiguousarray(np.asarray(a)))

    sd[pre + "patch_embed.proj.weight"] = t(np.asarray(bp["patch_embed"]["w"]).T.reshape(d, 3, 16, 16))
    sd[pre + "patch_embed.proj.bias"] = t(bp["patch_embed"]["b"])
    sd[pre + "cls_token"] = t(bp["cls_token"])
    for i, blk in enumerate(bp["blocks"]):
        p = f"{pre}blocks.{i}."
        sd[p + "norm1.weight"] = t(blk["norm1"]["g"])
        sd[p + "norm1.bias"] = t(blk["norm1"]["b"])
        sd[p + "attn.qkv.weight"] = t(np.asarray(blk["qkv_w"]).T)
        sd[p + "attn.q_bias"] = t(blk["q_bias"])
        sd[p + "attn.v_bias"] = t(blk["v_bias"])
        sd[p + "attn.proj.weight"] = t(np.asarray(blk["proj"]["w"]).T)
        sd[p + "attn.proj.bias"] = t(blk["proj"]["b"])
        sd[p + "attn.relative_position_bias_table"] = t(blk["rel_pos_table"])
        sd[p + "norm2.weight"] = t(blk["norm2"]["g"])
        sd[p + "norm2.bias"] = t(blk["norm2"]["b"])
        sd[p + "mlp.fc1.weight"] = t(np.asarray(blk["fc1"]["w"]).T)
        sd[p + "mlp.fc1.bias"] = t(blk["fc1"]["b"])
        sd[p + "mlp.fc2.weight"] = t(np.asarray(blk["fc2"]["w"]).T)
        sd[p + "mlp.fc2.bias"] = t(blk["fc2"]["b"])
        sd[p + "gamma_1"] = t(blk["gamma_1"])
        sd[p + "gamma_2"] = t(blk["gamma_2"])

    sd.update(dpt_torch_state_dict(params["dpt"],
                                   scratch=mp + "core.core.scratch.",
                                   post=mp + "core.core.pretrained.act_postprocess"))

    def put_mlp(prefix, mlp):
        for slot, conv in zip((0, 2), mlp):
            sd[f"{mp}{prefix}.{slot}.weight"] = t(conv["w"])
            sd[f"{mp}{prefix}.{slot}.bias"] = t(conv["b"])

    sd[mp + "conv2.weight"] = t(params["conv2"]["w"])
    sd[mp + "conv2.bias"] = t(params["conv2"]["b"])
    put_mlp("seed_bin_regressor._net", params["seed_bin_regressor"])
    put_mlp("seed_projector._net", params["seed_projector"])
    for i in range(len(params["projectors"])):
        put_mlp(f"projectors.{i}._net", params["projectors"][i])
        put_mlp(f"attractors.{i}._net", params["attractors"][i])
    put_mlp("conditional_log_binomial.mlp", params["conditional_log_binomial"])
    return sd
