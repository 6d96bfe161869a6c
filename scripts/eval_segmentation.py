"""Evaluate trained segmenter checkpoints on a validation set (TPU-native).

Usage (reference-compatible CLI):
    python scripts/eval_segmentation.py [key=value | --key value] ...

Mirrors the reference ``src/eval_segmentation.py``: for each checkpoint in
``model_paths``, runs flip-TTA probes (+ on-device dense CRF when ``run_crf``)
over the val split and reports Hungarian-matched cluster/linear mIoU+Accuracy.
Differences by design: the CRF and the confusion reduction run on-device in
the same jitted program (no per-image CPU CRF pool), and predictions for the
qualitative figure are written as color PNGs without a matplotlib dependency.
"""

import json
import os
import sys
import time
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from depthg_tpu.config import Config, cli_overrides, load_config
from depthg_tpu.data import ContrastiveSegDataset, DataLoader, get_transform
from depthg_tpu.data.datasets import create_cityscapes_colormap, create_pascal_label_colormap
from depthg_tpu.inference import make_eval_step, make_predict_step
from depthg_tpu.utils.checkpoint_io import (ecfg_from_checkpoint,
                                            fcfg_from_run_cfg, load_segmenter)
from depthg_tpu.utils.metrics import SegMetrics


def _maybe_wandb(cfg: Config):
    """Optional wandb run, gated exactly like the train CLI (reference eval
    logs metrics + plots to wandb, ``src/eval_segmentation.py:190-247``)."""
    if not cfg.get("wandb_logging"):
        return None
    try:
        import wandb
    except ImportError:
        print("wandb_logging=True but wandb is not installed; json logs only")
        return None
    wandb.init(project="depthg-tpu", name=f"eval-{cfg.experiment_name}",
               config=dict(cfg), job_type="eval")
    return wandb


def evaluate_checkpoint(model_path: str, cfg: Config, wandb=None) -> dict:
    params, run_cfg = load_segmenter(model_path)
    fcfg = fcfg_from_run_cfg(run_cfg)
    dataset_name = run_cfg.get("dataset_name", "cocostuff27")

    loader_crop = None if dataset_name == "voc" else "center"
    data_dir = cfg.data_dir
    if dataset_name == "nyuv2":
        data_dir = join(data_dir, "nyuv2")

    dataset = ContrastiveSegDataset(
        data_dir=data_dir,
        dataset_name=dataset_name,
        crop_type=None,
        image_set="val",
        transform=get_transform(cfg.res, False, loader_crop),
        target_transform=get_transform(cfg.res, True, loader_crop),
        cfg=run_cfg,
        mask=True,
    )
    n_classes = dataset.n_classes
    extra_clusters = int(run_cfg.get("extra_clusters", 0))

    loader = DataLoader(dataset, cfg.batch_size * 2, shuffle=False,
                        num_workers=cfg.num_workers)

    # eval passes the DATASET's class counts; demo/serve default to the
    # checkpoint's own shape (ecfg_from_checkpoint)
    ecfg = ecfg_from_checkpoint(cfg, params, run_cfg, n_classes=n_classes,
                                extra_clusters=extra_clusters)
    from depthg_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh_for_batch(int(cfg.batch_size) * 2, cfg.get("n_devices"))
    eval_step = make_eval_step(fcfg, ecfg, mesh)
    # place params on device ONCE (replicated across the mesh): passing the
    # numpy checkpoint tree into the jitted step re-transfers all ~88 MB
    # every batch — measured 2.2 s vs 0.43 s per batch-32 step on the
    # tunneled v5e (5x the whole eval step)
    import jax

    from jax.sharding import NamedSharding, PartitionSpec

    params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))

    linear_metrics = SegMetrics("final/linear/", n_classes, 0, False)
    cluster_metrics = SegMetrics("final/cluster/", n_classes, extra_clusters, True)

    import jax.numpy as jnp

    from depthg_tpu.data.loader import pack_batch, unpack_batch

    unpack_jit = jax.jit(unpack_batch, static_argnums=1)

    def stage(img, label):
        """One fused u8+f32 transfer instead of two device_puts (per-call
        latency dominates on tunneled hosts — see data.loader.pack_batch);
        multi-device meshes keep the per-key sharded path."""
        if n_dev > 1:
            return jnp.asarray(img), jnp.asarray(label)
        bufs, spec = pack_batch({"img": img, "label": label}, ("img", "label"))
        dev = unpack_jit(tuple(map(jnp.asarray, bufs)), spec)
        return dev["img"], dev["label"]

    t0 = time.time()
    n_images = 0
    pending = []
    full_bs = cfg.batch_size * 2
    n_dev = mesh.devices.size

    def place(batch):
        """Pad + pack + device_put one batch (runs on the prefetch thread so
        the transfer of batch k+1 overlaps the device step of batch k)."""
        img = batch["img"].astype(np.float32)
        label = batch["label"]
        if img.shape[0] < full_bs:
            # tail batch: pad only to mesh divisibility (a one-off small jit
            # bucket) instead of to the full batch — no CRF cycles are spent
            # on all-zero padding images
            pad = (-img.shape[0]) % n_dev
        else:
            pad = 0
        if pad:  # -1 labels are masked out of the confusion matrix
            img = np.concatenate([img, np.zeros((pad, *img.shape[1:]), np.float32)])
            label = np.concatenate([label, np.full((pad, *label.shape[1:]), -1,
                                                   label.dtype)])
        img_d, label_d = stage(img, label)
        return img_d, label_d, img.shape[0] - pad

    from depthg_tpu.data.loader import device_prefetch

    for img_d, label_d, n_real in device_prefetch(iter(loader), place):
        lin_stats, clu_stats = eval_step(params, img_d, label_d)
        pending.append((lin_stats, clu_stats))
        n_images += n_real
        if len(pending) >= 8:  # drain without stalling the device queue
            for ls, cs in pending:
                linear_metrics.add_stats(ls)
                cluster_metrics.add_stats(cs)
            pending.clear()
    for ls, cs in pending:  # add_stats fetches to host, so this drains the device
        linear_metrics.add_stats(ls)
        cluster_metrics.add_stats(cs)
    dt = time.time() - t0

    # end-to-end rate incl. host data loading; the device-only compute rate is
    # what bench.py measures (single-program chain) — different denominators
    # by design, named accordingly
    metrics = {**linear_metrics.compute(), **cluster_metrics.compute(),
               "images_per_sec_end_to_end": n_images / dt, "n_images": n_images}
    print(model_path)
    print(json.dumps(metrics, indent=2))
    if wandb is not None:
        wandb.log({k: v for k, v in metrics.items()
                   if isinstance(v, (int, float))})

    if cfg.get("run_prediction", False):
        result_dir = join(cfg.output_root, "predictions", cfg.experiment_name)
        for sub in ("img", "label", "cluster", "linear"):
            os.makedirs(join(result_dir, sub), exist_ok=True)
        cmap = (create_cityscapes_colormap() if dataset_name.startswith("cityscapes")
                else create_pascal_label_colormap())
        predict = make_predict_step(fcfg, ecfg)
        from depthg_tpu.data.transforms import unnormalize
        from PIL import Image

        batch = next(iter(loader))
        img = batch["img"].astype(np.float32)
        lin, clu = predict(params, img)
        lin, clu = jax.device_get(lin), jax.device_get(clu)
        clu_mapped = cluster_metrics.map_clusters(clu)
        n_show = min(img.shape[0], int(cfg.get("n_images", 8)))
        rgbs, label_rgb, clu_rgb, lin_rgb = [], [], [], []
        for j in range(n_show):
            rgb = np.clip(unnormalize(img[j]) * 255, 0, 255).astype(np.uint8).transpose(1, 2, 0)
            rgbs.append(rgb)
            label_rgb.append(cmap[np.maximum(batch["label"][j], 0)].astype(np.uint8))
            clu_rgb.append(cmap[np.maximum(clu_mapped[j], 0)].astype(np.uint8))
            lin_rgb.append(cmap[lin[j]].astype(np.uint8))
            Image.fromarray(rgb).save(join(result_dir, "img", f"{j}.jpg"))
            Image.fromarray(label_rgb[-1]).save(join(result_dir, "label", f"{j}.png"))
            Image.fromarray(clu_rgb[-1]).save(join(result_dir, "cluster", f"{j}.png"))
            Image.fromarray(lin_rgb[-1]).save(join(result_dir, "linear", f"{j}.png"))
        np.savez(join(result_dir, "confusion.npz"),
                 cluster=cluster_metrics.stats, linear=linear_metrics.stats)
        from depthg_tpu.utils.figures import confusion_matrix_figure, prediction_grid
        from depthg_tpu.utils.metrics import confusion_heatmap_png

        confusion_heatmap_png(cluster_metrics.stats, join(result_dir, "confusion.png"))
        # reference-style matplotlib figures (eval_segmentation.py:19-42,205-247)
        prediction_grid(rgbs, label_rgb, clu_rgb, lin_rgb, cmap,
                        join(result_dir, "prediction_grid.png"),
                        dark_mode=bool(cfg.get("dark_mode", False)))
        try:
            confusion_matrix_figure(cluster_metrics.stats, dataset_name, cmap,
                                    join(result_dir, "confusion_matrix.png"),
                                    extra_clusters)
        except ValueError:
            pass  # datasets without a reference class-name list
        if wandb is not None:  # the reference's wandb.Image plot uploads
            wandb.log({
                "predictions": wandb.Image(join(result_dir, "prediction_grid.png")),
                "confusion": wandb.Image(join(result_dir, "confusion.png")),
            })
    return metrics


def main(argv=None):
    from depthg_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    overrides = cli_overrides(argv if argv is not None else sys.argv[1:])
    # operating_point=<name>: expand a named, fidelity-validated CRF point
    # (ops.crf.EVAL_OPERATING_POINTS) ahead of the user's own overrides, so
    # explicit crf_* flags still win
    point = [o.split("=", 1)[1] for o in overrides
             if o.startswith("operating_point=")]
    if point:
        from depthg_tpu.ops.crf import operating_point_overrides
        overrides = (operating_point_overrides(point[-1])
                     + [o for o in overrides
                        if not o.startswith("operating_point=")])
    cfg = load_config("eval_config.yml", overrides)
    wandb = _maybe_wandb(cfg)
    all_metrics = {}
    for model_path in cfg.model_paths:
        all_metrics[model_path] = evaluate_checkpoint(model_path, cfg, wandb)
    out_path = join(cfg.output_root, "eval_metrics.json")
    os.makedirs(cfg.output_root, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(all_metrics, f, indent=2)
    print(f"wrote {out_path}")
    return all_metrics


if __name__ == "__main__":
    main()
