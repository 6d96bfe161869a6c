"""Fine-tune ZoeDepth on a metric-depth dataset (TPU-native).

The reference's ``train_mono.py`` + ``BaseTrainer.train`` epoch loop
(``src/zoedepth/trainers/base_trainer.py:142-258``) + ``Trainer`` of
``src/zoedepth/trainers/zoedepth_trainer.py:48-140``, re-shaped the
framework's way: one jitted fine-tune step (losses + 4-group one-cycle
AdamW, ``depthg_tpu/models/zoedepth/finetune.py``), a host epoch loop over
``DataLoadPreprocess`` samples, periodic validation computing the
reference's nine depth metrics (a1/abs_rel/rmse/silog/... with eigen/garg
crops, ``depthg_tpu/models/zoedepth/metrics.py``), a best-checkpoint
monitor on ``metric_criterion`` (abs_rel, lower is better —
``base_trainer.py:138-140``), and latest/best native checkpoints.

Usage::

    python scripts/finetune_zoedepth.py dataset=nyu data_root=/data \\
        filenames_file=train.txt filenames_file_eval=test.txt epochs=5

Synthetic-layout smoke: tests/test_zoedepth_data.py runs 5 steps + a
validation pass end to end on generated PNGs with a tiny model.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEFAULTS = {
    # data
    "dataset": "nyu",
    "data_root": None,           # DEPTH_DATASETS root override
    "data_path": None, "gt_path": None,
    "data_path_eval": None, "gt_path_eval": None,
    "filenames_file": "", "filenames_file_eval": "",
    "batch_size": 16,
    "aug": True, "random_crop": False, "random_translate": False,
    "seed": 0,
    # schedule (reference config_zoedepth.json train block)
    "epochs": 5, "lr": 0.000161, "wd": 0.01, "w_si": 1.0, "w_grad": 0.0,
    "clip_grad": 0.1, "same_lr": False,
    "validate_every": 0.25,      # fraction of an epoch (base_trainer.py:161)
    "log_every": 50,
    # model
    "checkpoint": None,          # ZoeD_M12_N.pt (torch) or native .npz
    "tiny_model": False,         # tests: small random ZoeConfig
    "output_dir": "./checkpoints_zoe",
    "max_steps": 0,              # 0 = no cap (tests cap it)
    "eval_limit": 0,             # 0 = whole eval set
    # validate against a specialized eval reader instead of
    # filenames_file_eval: any of models/zoedepth/eval_datasets.EVAL_READERS
    # (ibims, sunrgbd, diml_indoor/outdoor, diode_*, hypersim_test, vkitti,
    # vkitti2, ddad); eval_data_root = its folder
    "eval_dataset": None, "eval_data_root": None,
}


def build_model(cfg):
    import jax

    from depthg_tpu.models.zoedepth.model import ZoeConfig, zoedepth_init

    if cfg["tiny_model"]:
        from depthg_tpu.models.zoedepth.beit import BEiTConfig
        from depthg_tpu.models.zoedepth.dpt import DPTConfig
        zcfg = ZoeConfig(
            n_bins=4, bin_embedding_dim=8, n_attractors=(2, 2, 1, 1),
            img_size=(64, 96),
            beit=BEiTConfig(embed_dim=64, depth=4, num_heads=4,
                            pretrain_window=4, hooks=(0, 1, 2, 3)),
            dpt=DPTConfig(embed_dim=64, features=16,
                          reassemble_channels=(8, 16, 32, 32)))
        return zcfg, zoedepth_init(jax.random.PRNGKey(cfg["seed"]), zcfg)
    spec = None
    from depthg_tpu.models.zoedepth.config import DEPTH_DATASETS
    spec = DEPTH_DATASETS[cfg["dataset"]]
    zcfg = ZoeConfig(min_depth=spec.min_depth, max_depth=spec.max_depth)
    if cfg["checkpoint"]:
        from depthg_tpu.models.zoedepth.convert import load_zoedepth_pt
        params = load_zoedepth_pt(cfg["checkpoint"])
        return zcfg, params
    return zcfg, zoedepth_init(jax.random.PRNGKey(cfg["seed"]), zcfg)


def build_data(cfg):
    from depthg_tpu.models.zoedepth.data_mono import (DataLoadPreprocess,
                                                      MonoDepthDataConfig)

    over = {k: cfg[k] for k in ("data_path", "gt_path", "data_path_eval",
                                "gt_path_eval") if cfg[k]}
    dcfg = MonoDepthDataConfig.for_dataset(
        cfg["dataset"], cfg["data_root"],
        filenames_file=cfg["filenames_file"],
        filenames_file_eval=cfg["filenames_file_eval"],
        aug=bool(cfg["aug"]), random_crop=bool(cfg["random_crop"]),
        random_translate=bool(cfg["random_translate"]),
        seed=int(cfg["seed"]), **over)
    train = DataLoadPreprocess(dcfg, "train")
    test = (DataLoadPreprocess(dcfg, "online_eval")
            if cfg["filenames_file_eval"] else None)
    return dcfg, train, test


def validate(params, zcfg, dcfg, test_set, spec, limit=0):
    """Reference ``validate_on_batch`` (zoedepth_trainer.py:106-140): forward
    at native eval resolution, SILog on valid samples, nine crop-masked
    metrics averaged per image."""
    import jax
    import jax.numpy as jnp

    from depthg_tpu.models.zoedepth import finetune
    from depthg_tpu.models.zoedepth.metrics import (RunningAverageDict,
                                                    compute_metrics)
    from depthg_tpu.models.zoedepth.model import zoedepth_forward

    @jax.jit
    def fwd(params, img):
        return zoedepth_forward(params, img, zcfg)["metric_depth"]

    metrics_avg, losses_avg = RunningAverageDict(), RunningAverageDict()
    n = len(test_set) if not limit else min(limit, len(test_set))
    for i in range(n):
        s = test_set[i]
        # DataLoadPreprocess marks missing depths; the specialized eval
        # readers (models/zoedepth/eval_datasets.py) always carry one
        if not s.get("has_valid_depth", "depth" in s):
            continue
        if "mask" not in s:
            # readers emit raw depth; validity = the dataset's open bounds
            # (the reference applies the same bounds inside compute_metrics)
            s = dict(s, mask=(s["depth"] > spec.min_depth)
                     & (s["depth"] < spec.max_depth))
        img = jnp.asarray(s["image"][None])
        pred = np.asarray(fwd(params, img))[0]
        l_si = float(finetune.silog_loss(
            jnp.asarray(pred[None]), jnp.asarray(s["depth"][None]),
            jnp.asarray(s["mask"][None])))
        losses_avg.update({"silog": l_si})
        metrics_avg.update(compute_metrics(
            s["depth"][0], pred[0],
            garg_crop=spec.crop == "garg", eigen_crop=spec.crop == "eigen",
            dataset=dcfg.dataset, min_depth_eval=spec.min_depth_eval,
            max_depth_eval=spec.max_depth_eval))
    return metrics_avg.get_value(), losses_avg.get_value()


def main(argv=None):
    from depthg_tpu.config import apply_overrides, Config, cli_overrides

    cfg = Config(DEFAULTS)
    cfg = apply_overrides(cfg, cli_overrides(sys.argv[1:] if argv is None
                                             else argv))

    import jax
    import jax.numpy as jnp

    from depthg_tpu.models.zoedepth import finetune
    from depthg_tpu.models.zoedepth.config import DEPTH_DATASETS
    from depthg_tpu.models.zoedepth.data_mono import batched
    from depthg_tpu.utils.checkpoint_io import save_native

    zcfg, params = build_model(cfg)
    dcfg, train_set, test_set = build_data(cfg)
    spec = DEPTH_DATASETS[cfg["dataset"]]
    if cfg["eval_dataset"]:
        from depthg_tpu.models.zoedepth.eval_datasets import get_eval_reader
        test_set = get_eval_reader(cfg["eval_dataset"], cfg["eval_data_root"])
        spec = DEPTH_DATASETS[cfg["eval_dataset"]]

    steps_per_epoch = max(len(train_set) // int(cfg["batch_size"]), 1)
    total = int(cfg["epochs"]) * steps_per_epoch
    if cfg["max_steps"]:
        total = min(total, int(cfg["max_steps"]))
    ftcfg = finetune.FinetuneConfig(
        lr=float(cfg["lr"]), wd=float(cfg["wd"]), w_si=float(cfg["w_si"]),
        w_grad=float(cfg["w_grad"]), clip_grad=float(cfg["clip_grad"]),
        same_lr=bool(cfg["same_lr"]), total_steps=total)
    init_fn, step_fn = finetune.make_finetune_step(zcfg, ftcfg)
    params = jax.device_put(params)
    opt_state = init_fn(params)

    validate_every = max(int(float(cfg["validate_every"]) * steps_per_epoch), 1)
    os.makedirs(cfg["output_dir"], exist_ok=True)
    best = np.inf
    step = 0
    rng = np.random.default_rng(int(cfg["seed"]))
    log_path = os.path.join(cfg["output_dir"], "finetune_log.jsonl")
    log_f = open(log_path, "a")

    def save(name, metrics=None):
        path = os.path.join(cfg["output_dir"], name)
        save_native(path, params, dict(cfg),
                    extra={"step": step, "metrics": metrics or {}})
        return path

    for epoch in range(int(cfg["epochs"])):
        order = rng.permutation(len(train_set))
        for batch in batched(train_set, int(cfg["batch_size"]), order):
            t0 = time.time()
            device_batch = {
                "image": jnp.asarray(batch["image"]),
                "depth": jnp.asarray(batch["depth"]),
                "mask": jnp.asarray(batch["mask"]),
            }
            params, opt_state, logs = step_fn(params, opt_state, device_batch)
            step += 1
            if step % int(cfg["log_every"]) == 0 or step == 1:
                rec = {"step": step, "epoch": epoch,
                       "ms": round((time.time() - t0) * 1e3, 1),
                       **{k: float(v) for k, v in logs.items()}}
                print(json.dumps(rec), flush=True)
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
            if test_set is not None and step % validate_every == 0:
                save("latest")
                metrics, vlosses = validate(params, zcfg, dcfg, test_set,
                                            spec, int(cfg["eval_limit"]))
                rec = {"step": step, "val": metrics, "val_losses": vlosses}
                print(json.dumps(rec), flush=True)
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
                crit = metrics.get("abs_rel", np.inf)
                if crit < best:
                    best = crit
                    save("best", metrics)
            if cfg["max_steps"] and step >= int(cfg["max_steps"]):
                break
        if cfg["max_steps"] and step >= int(cfg["max_steps"]):
            break

    save("latest")
    if test_set is not None:
        metrics, vlosses = validate(params, zcfg, dcfg, test_set, spec,
                                    int(cfg["eval_limit"]))
        print(json.dumps({"final": metrics, "val_losses": vlosses}),
              flush=True)
        log_f.write(json.dumps({"step": step, "final": metrics}) + "\n")
    log_f.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
