"""End-to-end pipeline smoke (SURVEY.md §4): synthetic COCO -> crop ->
precompute_knns -> train a few steps -> eval, all through the CLI mains."""

import json
import os
import sys
from os.path import join

import numpy as np
import pytest
from PIL import Image

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")


def _load_script(name):
    """Import a CLI script by file path (the reference dir on sys.path from the
    parity tests shadows these module names otherwise)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"depthg_scripts_{name}", os.path.join(SCRIPTS, name + ".py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    rng = np.random.default_rng(0)
    base = join(root, "cocostuff")
    ids = {"train2017": [f"img{i}" for i in range(8)],
           "val2017": [f"val{i}" for i in range(4)]}
    for split, names in ids.items():
        os.makedirs(join(base, "curated", split), exist_ok=True)
        os.makedirs(join(base, "images", split), exist_ok=True)
        os.makedirs(join(base, "annotations", split), exist_ok=True)
        os.makedirs(join(base, "depth", split), exist_ok=True)
        for lst in ("Coco164kFull_Stuff_Coarse.txt", "Coco164kFull_Stuff_Coarse_7.txt"):
            with open(join(base, "curated", split, lst), "w") as f:
                f.write("\n".join(names))
        for n in names:
            Image.fromarray(rng.integers(0, 255, (96, 96, 3), np.uint8)).save(
                join(base, "images", split, n + ".jpg"))
            Image.fromarray(rng.integers(0, 182, (96, 96)).astype(np.uint8)).save(
                join(base, "annotations", split, n + ".png"))
            Image.fromarray(rng.integers(0, 255, (96, 96), np.uint8)).save(
                join(base, "depth", split, n + "_zoedepth.png"))
    return root


COMMON = [
    "model_type=vit_tiny", "dim=16", "res=32", "batch_size=4", "num_workers=2",
    "feature_samples=3", "neg_samples=2", "num_neighbors=3",
]


@pytest.mark.slow
def test_full_pipeline(coco_root, tmp_path):
    crop_datasets = _load_script("crop_datasets")
    precompute_knns = _load_script("precompute_knns")
    train_segmentation = _load_script("train_segmentation")

    out_root = str(tmp_path / "outputs")
    args = COMMON + [f"data_dir={coco_root}", f"output_root={out_root}"]

    # 1. five-crop with depth
    crop_datasets.main(args + ["crop_datasets=[cocostuff27]",
                               "crop_image_sets=[train]", "generate_depth=True"])
    crop_dir = join(coco_root, "cropped", "cocostuff27_five_crop_0.5")
    assert len(os.listdir(join(crop_dir, "img", "train"))) == 40
    assert len(os.listdir(join(crop_dir, "depth", "train"))) == 40
    lab = np.asarray(Image.open(join(crop_dir, "label", "train", "0.png")))
    assert lab.min() >= 0  # stored +1

    # 2. KNN over the crops
    precompute_knns.main(args + ["knn_datasets=[cocostuff27]",
                                 "knn_crop_types=[five]", "knn_image_sets=[train]"])
    nn_file = join(coco_root, "nns", "nns_vit_tiny_cocostuff27_train_five_32.npz")
    assert os.path.exists(nn_file)
    nns = np.load(nn_file)["nns"]
    assert nns.shape == (40, 30)
    assert (nns[:, 0] == np.arange(40)).all()  # rank-0 neighbor is self

    # 3. train a few steps (random backbone; checks the loop, not quality)
    train_segmentation.main(args + [
        "max_steps=3", "val_freq=3", "scalar_log_freq=1", "use_depth=True",
        "depth_sampling=fps", "depth_feat_correlation_loss=True",
        "experiment_name=e2e", "wandb_logging=False"])
    ckpt_root = join(out_root, "checkpoints")
    runs = os.listdir(ckpt_root)
    assert runs, "no checkpoint dir written"
    run_dir = join(ckpt_root, runs[0])
    assert "last" in os.listdir(run_dir)

    # 4. eval the trained checkpoint through the eval CLI
    eval_segmentation = _load_script("eval_segmentation")

    eval_segmentation.main(args + [
        f"model_paths=[{join(run_dir, 'last')}]", "run_crf=True",
        "crf_downsample=2", "run_prediction=False", "res=32",
        "experiment_name=e2e_eval"])
    metrics = json.load(open(join(out_root, "eval_metrics.json")))
    vals = list(metrics.values())[0]
    assert np.isfinite(vals["final/cluster/mIoU"])
    assert vals["n_images"] == 4


@pytest.mark.slow
def test_observability_and_retention(coco_root, tmp_path):
    """tfevents (scalars + hist_freq histograms + rotation), save_top_k=2
    retention, and the reference-format .ckpt export (VERDICT r1 items 7/8)."""
    train_segmentation = _load_script("train_segmentation")

    out_root = str(tmp_path / "outputs_obs")
    args = COMMON + [f"data_dir={coco_root}", f"output_root={out_root}"]
    if not os.path.isdir(join(coco_root, "cropped", "cocostuff27_five_crop_0.5")):
        _load_script("crop_datasets").main(args + [
            "crop_datasets=[cocostuff27]", "crop_image_sets=[train]",
            "generate_depth=True"])
        _load_script("precompute_knns").main(args + [
            "knn_datasets=[cocostuff27]", "knn_crop_types=[five]",
            "knn_image_sets=[train]"])
    train_segmentation.main(args + [
        "max_steps=8", "val_freq=2", "scalar_log_freq=1", "hist_freq=2",
        "use_depth=True", "depth_sampling=fps",
        "depth_feat_correlation_loss=True", "experiment_name=obs",
        "wandb_logging=False", "save_top_k=2"])

    run_dir = join(out_root, "checkpoints", os.listdir(join(out_root, "checkpoints"))[0])
    entries = os.listdir(run_dir)
    step_tags = sorted({e.split(".")[0] for e in entries if e.startswith("step")})
    assert len(step_tags) == 2, step_tags  # top-k retention pruned the rest
    # torch-compatible exports alongside the native checkpoints
    for tag in ("best", "last", *step_tags):
        assert tag in entries and f"{tag}.ckpt" in entries, (tag, entries)
    import torch

    blob = torch.load(join(run_dir, "last.ckpt"), map_location="cpu",
                      weights_only=False)
    assert "net.model.cls_token" in blob["state_dict"]
    assert blob["hyper_parameters"]["cfg"]["dim"] == 16

    # TensorBoard event files parse and contain scalars + histograms
    tb_root = join(out_root, "tb")
    tb_dir = join(tb_root, os.listdir(tb_root)[0])
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(tb_dir)
    acc.Reload()
    assert "loss/total" in acc.Tags()["scalars"]
    assert "intra_cd" in acc.Tags()["histograms"]
    steps = [s.step for s in acc.Scalars("loss/total")]
    assert len(steps) >= 1
    # on_train_start hyperparameter logging (reference 464-469): the hparams
    # plugin session lands in the same run directory
    assert acc.PluginTagToContent("hparams"), "no hparams logged to tfevents"


@pytest.mark.slow
def test_feature_pyramid_cli(coco_root, tmp_path):
    """arch=feature-pyramid trains through the train CLI (reference
    src/train_segmentation.py:99-101) and evals through the eval CLI."""
    train_segmentation = _load_script("train_segmentation")
    eval_segmentation = _load_script("eval_segmentation")

    out_root = str(tmp_path / "outputs_pyr")
    args = COMMON + [f"data_dir={coco_root}", f"output_root={out_root}"]
    if not os.path.isdir(join(coco_root, "cropped", "cocostuff27_five_crop_0.5")):
        _load_script("crop_datasets").main(args + [
            "crop_datasets=[cocostuff27]", "crop_image_sets=[train]",
            "generate_depth=True"])
    # KNNs under the pyramid's backbone name (reference precompute_knns
    # embeds non-ViT model_types through load_model)
    _load_script("precompute_knns").main(args + [
        "model_type=resnet50", "knn_datasets=[cocostuff27]",
        "knn_crop_types=[five]", "knn_image_sets=[train]"])
    assert os.path.exists(join(coco_root, "nns",
                               "nns_resnet50_cocostuff27_train_five_32.npz"))
    train_segmentation.main(args + [
        "arch=feature-pyramid", "model_type=resnet50", "granularity=2",
        "max_steps=2", "val_freq=2", "scalar_log_freq=1", "use_depth=True",
        "depth_sampling=fps", "depth_feat_correlation_loss=True",
        "experiment_name=pyr", "wandb_logging=False"])
    run_dir = join(out_root, "checkpoints",
                   os.listdir(join(out_root, "checkpoints"))[0])
    assert "last" in os.listdir(run_dir)
    # no Lightning export for non-dino archs (reference ckpt layout is
    # DinoFeaturizer-specific)
    assert "last.ckpt" not in os.listdir(run_dir)

    eval_segmentation.main(args + [
        f"model_paths=[{join(run_dir, 'last')}]", "run_crf=True",
        "crf_downsample=2", "run_prediction=False", "res=32",
        "experiment_name=pyr_eval"])
    metrics = json.load(open(join(out_root, "eval_metrics.json")))
    vals = list(metrics.values())[0]
    assert np.isfinite(vals["final/cluster/mIoU"])


def test_feature_pyramid_guards(tmp_path):
    """The pyramid-arch CLI fails loudly instead of silently degrading:
    a non-resnet50 model_type must not fall back to a random resnet50 under
    the wrong label (the fallback exists only for missing weight FILES of a
    valid family), an unknown model_type hits the reference's ValueError
    (src/utils.py:120) rather than torch.load(<data_dir>), and rec_weight>0
    is rejected up front — the reference's own decoder/feats shapes disagree
    for this arch (src/modules.py:709 vs src/train_segmentation.py:392-397)."""
    from depthg_tpu.config import Config
    from depthg_tpu.models.pyramid import load_model

    train = _load_script("train_segmentation")

    with pytest.raises(ValueError, match="No model"):
        load_model("vit_small", str(tmp_path))  # unknown type, data_dir exists

    cfg = Config({"arch": "feature-pyramid", "model_type": "vgg11",
                  "output_root": str(tmp_path)})
    with pytest.raises(ValueError, match="resnet50-family"):
        train.load_backbone(cfg, None)  # wrong family, with OR without weights

    with pytest.raises(NotImplementedError, match="rec_weight"):
        train.main(COMMON + ["arch=feature-pyramid", "model_type=resnet50",
                             "rec_weight=0.5", f"output_root={tmp_path}"])
