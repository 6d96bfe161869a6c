"""Checkpoint resume: training continues from a saved train state."""

import json
import os
import sys
from os.path import join

import numpy as np
import pytest
from PIL import Image

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")

from synthetic_data import make_cropped_dataset, make_nns


def _load_script(name):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"depthg_resume_{name}", os.path.join(SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_resume_continues_from_step(tmp_path):
    root = str(tmp_path / "data")
    make_cropped_dataset(root, n=8, size=64, splits=("train",))
    make_nns(root, "vit_tiny", "cocostuff27", "train", "five", 32, n=8)
    # minimal val split (Coco layout)
    base = join(root, "cocostuff")
    for sub in ("curated/val2017", "images/val2017", "annotations/val2017"):
        os.makedirs(join(base, sub), exist_ok=True)
    rng = np.random.default_rng(0)
    with open(join(base, "curated/val2017/Coco164kFull_Stuff_Coarse_7.txt"), "w") as f:
        f.write("v0\nv1")
    for n in ("v0", "v1"):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
            join(base, "images/val2017", n + ".jpg"))
        Image.fromarray(rng.integers(0, 182, (64, 64)).astype(np.uint8)).save(
            join(base, "annotations/val2017", n + ".png"))

    train = _load_script("train_segmentation")
    out = str(tmp_path / "out")
    args = ["model_type=vit_tiny", "dim=16", "res=32", "batch_size=4",
            "num_workers=1", "feature_samples=3", "neg_samples=2",
            "num_neighbors=3", f"data_dir={root}", f"output_root={out}",
            "val_freq=2", "scalar_log_freq=1", "experiment_name=resume_test"]
    train.main(args + ["max_steps=2"])
    runs = os.listdir(join(out, "checkpoints"))
    resume_pkl = join(out, "checkpoints", runs[0], "last.train_state.pkl")
    assert os.path.exists(resume_pkl)

    import pickle

    step0 = pickle.load(open(resume_pkl, "rb"))["step"]
    assert step0 == 2

    # resume for 2 more steps; the new run's state starts at step 2
    train.main(args + ["max_steps=4", f"resume={resume_pkl}"])
    runs2 = sorted(os.listdir(join(out, "checkpoints")))
    newest = max(runs2, key=lambda r: os.path.getmtime(join(out, "checkpoints", r)))
    blob = pickle.load(open(join(out, "checkpoints", newest, "last.train_state.pkl"), "rb"))
    assert blob["step"] == 4
