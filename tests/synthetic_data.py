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
