"""Train the DepthG segmenter (TPU-native).

Mirrors the reference ``src/train_segmentation.py`` training semantics —
contrastive correlation distillation with depth guidance, three Adam groups,
decay schedules, periodic validation with Hungarian-matched metrics, best/last
checkpointing monitored on ``test/cluster/mIoU`` (Accuracy for potsdam) — as a
host loop around one jitted, mesh-shardable train step.

TPU-specific structure:
* decay schedules are host functions of the step; shape-affecting values
  (feature_samples, sampling mode) pick a jit bucket;
* the frozen DINO backbone is loaded from ``pretrained_weights`` (zero-egress:
  no torch-hub download; pass a DINO ``.pth`` or Lightning ``.ckpt``) and kept
  on host for checkpoint writes — only ~MBs of trainables ever leave the
  device;
* validation accumulates confusion matrices on device and fetches [K, C] ints.
"""

import json
import os
import sys
import time
from datetime import datetime
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from depthg_tpu.config import cli_overrides, load_config
from depthg_tpu.data import ContrastiveSegDataset, DataLoader, get_transform
from depthg_tpu.data.transforms import GeometricAug, PhotometricAug
from depthg_tpu.utils.checkpoint_io import fcfg_from_run_cfg, save_native
from depthg_tpu.utils.metrics import SegMetrics


def build_datasets(cfg):
    eval_res = 224 if cfg.model_type == "mae" else 320
    use_augs = float(cfg.aug_alignment_weight) > 0
    data_dir = cfg.data_dir
    train_dataset = ContrastiveSegDataset(
        data_dir=data_dir, dataset_name=cfg.dataset_name, crop_type=cfg.crop_type,
        image_set="train",
        transform=get_transform(cfg.res, False, cfg.loader_crop_type),
        target_transform=get_transform(cfg.res, True, cfg.loader_crop_type),
        cfg=cfg,
        aug_geometric_transform=GeometricAug(cfg.res) if use_augs else None,
        aug_photometric_transform=PhotometricAug() if use_augs else None,
        num_neighbors=cfg.num_neighbors, mask=True, pos_images=True, pos_labels=True,
        return_depth=cfg.use_depth, depth_type=cfg.depth_type)

    val_crop = None if cfg.dataset_name == "voc" else "center"
    val_dir = join(data_dir, "nyuv2") if cfg.dataset_name == "nyuv2" else data_dir
    val_dataset = ContrastiveSegDataset(
        data_dir=val_dir, dataset_name=cfg.dataset_name, crop_type=None,
        image_set="val",
        transform=get_transform(eval_res, False, val_crop),
        target_transform=get_transform(eval_res, True, val_crop),
        cfg=cfg, mask=True)
    return train_dataset, val_dataset, eval_res


def load_backbone(cfg, fcfg):
    """Frozen backbone weights. arch=dino[_depth]: DINO .pth / Lightning
    .ckpt path; arch=feature-pyramid: load_model weights from
    ``{output_root}/data`` (reference src/train_segmentation.py:100). Falls
    back to random init with a warning (zero egress: no hub downloads)."""
    import jax

    from depthg_tpu.models.featurizer import featurizer_init
    from depthg_tpu.utils import ckpt as torch_ckpt

    cpu = jax.devices("cpu")[0]
    if cfg.arch == "feature-pyramid":
        from depthg_tpu.models.pyramid import (RESNET50_MODEL_TYPES,
                                               load_model, resnet50_init)

        # validate the model_type BEFORE touching the filesystem so a
        # missing weights file can never silently swap model families: the
        # random-init fallback below is only ever a resnet50
        # (FeaturePyramidNet channel layout, src/modules.py:703-704)
        if cfg.model_type not in RESNET50_MODEL_TYPES:
            raise ValueError(
                f"arch=feature-pyramid needs a resnet50-family model_type "
                f"{sorted(RESNET50_MODEL_TYPES)} (FeaturePyramidNet channel "
                f"layout, src/modules.py:703); got {cfg.model_type!r}")
        try:
            params, _, _ = load_model(cfg.model_type, join(cfg.output_root, "data"))
            return params
        except FileNotFoundError as e:
            print(f"WARNING: {e}; the backbone is randomly initialized.")
            with jax.default_device(cpu):
                return jax.tree_util.tree_map(
                    np.asarray, resnet50_init(jax.random.PRNGKey(0)))

    path = cfg.get("pretrained_weights")
    if path and os.path.exists(path):
        if path.endswith(".ckpt"):
            params, _ = torch_ckpt.load_lightning_ckpt(path)
            return params["net"]["vit"]
        return torch_ckpt.load_dino_pth(path)
    print("WARNING: pretrained_weights not provided/found. The reference would "
          "download DINO weights from torch hub; this environment has no "
          "egress, so the backbone is randomly initialized. Pass "
          "pretrained_weights=/path/to/dino.pth for real runs.")
    with jax.default_device(cpu):
        return jax.tree_util.tree_map(
            np.asarray, featurizer_init(jax.random.PRNGKey(0), fcfg)["vit"])


def main(argv=None):
    from depthg_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    overrides = cli_overrides(argv if argv is not None else sys.argv[1:])
    cfg = load_config("local_config.yml", overrides)

    import functools

    import jax
    import jax.numpy as jnp

    from depthg_tpu.inference import make_validation_step
    from depthg_tpu.models.featurizer import FeaturizerConfig
    from depthg_tpu.parallel import mesh as mesh_lib
    from depthg_tpu.train import decay as decay_lib
    from depthg_tpu.train import losses as loss_lib
    from depthg_tpu.train import step as step_lib
    from depthg_tpu.utils.ckpt import to_jax

    if cfg.arch not in ("dino", "dino_depth", "feature-pyramid"):
        raise NotImplementedError(f"arch={cfg.arch}")
    if cfg.arch == "feature-pyramid" and float(cfg.get("rec_weight", 0)) > 0:
        # broken in the reference too: its decoder maps dim -> n_feats where
        # FeaturePyramidNet.n_feats = dim (src/modules.py:709), but the rec
        # loss dots rec_feats against the 2048-channel 7x7 low_res_feats
        # (src/train_segmentation.py:392-397) — shape mismatch either way.
        # Every shipped config keeps rec_weight=0 for this arch.
        raise NotImplementedError(
            "rec_weight > 0 is unsupported for arch=feature-pyramid (the "
            "reference's own decoder/feats shapes disagree there)")

    # decoded-image LRU (data/datasets.py): training revisits every image
    # each epoch on a single-core host — on by default HERE only; one-pass
    # CLIs (eval/demo) leave it off unless cfg sets image_cache_mb. Configure
    # the cache directly rather than writing into cfg: the cfg dict is
    # persisted into every checkpoint (save_native run_cfg) and eval loads
    # that run_cfg — a mutated key would re-enable the cache for exactly the
    # one-pass workload the default keeps it off for.
    if cfg.get("image_cache_mb") is None:
        from depthg_tpu.data.datasets import IMAGE_CACHE
        IMAGE_CACHE.configure(512)

    seed = int(cfg.get("seed", 0))
    np.random.seed(seed)

    name = "{}/{}_{}_date_{}".format(cfg.log_dir, cfg.dataset_name,
                                     cfg.experiment_name,
                                     datetime.now().strftime("%b%d_%H-%M-%S"))
    checkpoint_dir = join(cfg.output_root, "checkpoints", name.replace("/", "_"))
    log_path = join(cfg.output_root, "logs", name.replace("/", "_") + ".jsonl")
    os.makedirs(checkpoint_dir, exist_ok=True)
    os.makedirs(os.path.dirname(log_path), exist_ok=True)
    log_file = open(log_path, "a")

    wandb = None
    if cfg.get("wandb_logging"):
        try:
            import wandb as _wandb

            # sync_tensorboard mirrors the tfevents stream into wandb like the
            # reference (src/train_segmentation.py:673)
            _wandb.init(project="depthg-tpu", name=name, config=dict(cfg),
                        sync_tensorboard=True)
            wandb = _wandb
        except ImportError:
            print("wandb_logging=True but wandb is not installed; jsonl logs only")

    # TensorBoard event files (reference TensorBoardLogger,
    # src/train_segmentation.py:662-665), rotated every 2000 steps like the
    # reference (457-460); torch's writer is a pure-host dependency here
    tb_writer = None
    tb_dir = join(cfg.output_root, "tb", name.replace("/", "_"))
    if cfg.get("tensorboard_logging", True):
        try:
            from torch.utils.tensorboard import SummaryWriter

            tb_writer = SummaryWriter(log_dir=tb_dir)
        except ImportError:
            print("tensorboard not available; jsonl logs only")

    train_dataset, val_dataset, eval_res = build_datasets(cfg)
    n_classes = train_dataset.n_classes

    fcfg = fcfg_from_run_cfg(cfg)  # arch-aware (handles dino_depth)
    hp = step_lib.hparams_from_cfg(cfg, n_classes)
    dcfg = decay_lib.from_cfg(cfg)
    base_lcfg = loss_lib.from_cfg(cfg)

    host_backbone = load_backbone(cfg, fcfg)

    state = step_lib.init_state(jax.random.PRNGKey(seed), fcfg, hp)
    state["frozen"]["vit"] = to_jax(host_backbone)

    start_step = 0
    if cfg.get("resume"):
        import pickle

        with open(cfg.resume, "rb") as f:
            blob = pickle.load(f)
        state["params"] = to_jax(blob["params"])
        state["opt"] = jax.tree_util.tree_map(
            lambda a, b: jnp.asarray(b), state["opt"], blob["opt"])
        start_step = int(blob["step"])
        state["step"] = jnp.asarray(start_step, jnp.int32)
        print(f"resumed from {cfg.resume} at step {start_step}")

    mesh = mesh_lib.make_mesh_for_batch(int(cfg.batch_size), cfg.get("n_devices"))
    multi = mesh.devices.size > 1
    if multi:
        state = mesh_lib.replicate(state, mesh)
        # (feature-pyramid backbones are conv-only — no attention field)
        if getattr(fcfg, "attention_impl", "xla") != "xla":
            # The train step scales via auto-partitioned jit (threefry
            # dropout masks stay bitwise equal to the single-device run);
            # Pallas attention kernels require manual mesh axes, so the
            # multi-device step pins the backbone to the XLA einsum path.
            # (The sharded EVAL step runs under shard_map and keeps its
            # Pallas kernels — inference.make_eval_step.)
            import dataclasses as _dc
            print("multi-device train: attention_impl ->"
                  f" xla (was {fcfg.attention_impl}; Pallas kernels need"
                  " manual mesh axes)", flush=True)
            fcfg = _dc.replace(fcfg, attention_impl="xla")

    train_loader = DataLoader(train_dataset, cfg.batch_size, shuffle=True,
                              num_workers=cfg.num_workers, drop_last=True, seed=seed)
    val_loader = DataLoader(val_dataset, cfg.batch_size, shuffle=False,
                            num_workers=cfg.num_workers)

    import dataclasses

    @functools.partial(jax.jit, static_argnames=("mode", "s", "hist"))
    def jstep(state, batch, key, w, sh, mode, s, hist=False):
        lcfg = dataclasses.replace(base_lcfg, depth_sampling=mode, feature_samples=s)
        hp_s = dataclasses.replace(hp, log_hist=True) if hist else hp
        return step_lib.train_step(state, batch, key, fcfg, hp_s, lcfg, w, sh)

    val_step = make_validation_step(fcfg, n_classes, hp.extra_clusters)

    monitor = "test/cluster/Accuracy" if cfg.dataset_name == "potsdam" else "test/cluster/mIoU"
    best_monitor = -1.0
    maxima = {}

    needed = {"img", "img_pos", "label", "depth", "depth_pos"}
    if cfg.use_true_labels:
        needed.add("label_pos")
    if cfg.use_salience:
        needed |= {"mask", "mask_pos"}
    if float(cfg.aug_alignment_weight) > 0:
        needed |= {"img_aug", "coord_aug"}

    from depthg_tpu.data.loader import pack_batch, unpack_batch

    unpack_jit = jax.jit(unpack_batch, static_argnums=1)

    def device_batch(batch):
        if not multi:
            # single device: ONE fused transfer (per-call device_put latency
            # dominates on tunneled hosts — see data.loader.pack_batch)
            bufs, spec = pack_batch(batch, needed)
            return unpack_jit(tuple(jnp.asarray(b) for b in bufs), spec)
        out = {}
        for k in needed:
            if k in batch:
                v = batch[k]
                v = v.astype(np.float32) if v.dtype in (np.float64,) else v
                out[k] = jnp.asarray(v)
        return mesh_lib.shard_batch(out, mesh)

    def save_ckpt(tag, metrics=None):
        params = jax.device_get(step_lib.eval_params_from_state(state))
        params["net"]["vit"] = host_backbone  # avoid re-fetching the backbone
        save_native(join(checkpoint_dir, tag), params, dict(cfg),
                    extra={"metrics": metrics or {}})
        if cfg.get("export_torch_ckpt", True) and cfg.arch == "dino":
            # reference-compatible Lightning .ckpt so the reference's own
            # eval_segmentation.py can validate weights trained here
            from depthg_tpu.utils.ckpt import export_lightning_ckpt

            export_lightning_ckpt(join(checkpoint_dir, tag + ".ckpt"), params,
                                  cfg=dict(cfg), n_classes=n_classes,
                                  global_step=int(state["step"]))
        # full resumable train state (trainables + optimizer moments + step);
        # optax NamedTuple structure survives pickling, unlike a bare orbax
        # pytree restore
        import pickle

        resume_blob = {
            "params": jax.device_get(state["params"]),
            "opt": jax.device_get(state["opt"]),
            "step": int(state["step"]),
        }
        with open(join(checkpoint_dir, tag + ".train_state.pkl"), "wb") as f:
            pickle.dump(resume_blob, f)

    # save_top_k=2 retention (reference ModelCheckpoint,
    # src/train_segmentation.py:703-710): keep the two best step-tagged
    # checkpoints by the monitor plus best/last
    topk_kept: list = []  # [(monitor_value, step, tag)] sorted desc

    def save_topk(step_num, value, metrics):
        import shutil

        tag = f"step{step_num}"
        save_ckpt(tag, metrics)
        topk_kept.append((value, step_num, tag))
        topk_kept.sort(key=lambda t: (-t[0], -t[1]))
        while len(topk_kept) > int(cfg.get("save_top_k", 2)):
            _, _, old = topk_kept.pop()
            for suffix in ("", ".ckpt", ".train_state.pkl"):
                p = join(checkpoint_dir, old + suffix)
                if os.path.isdir(p):
                    shutil.rmtree(p, ignore_errors=True)
                elif os.path.exists(p):
                    os.remove(p)

    def run_validation(step_num):
        linear_m = SegMetrics("test/linear/", n_classes, 0, False)
        cluster_m = SegMetrics("test/cluster/", n_classes, hp.extra_clusters, True)
        eval_params = step_lib.eval_params_from_state(state)
        for batch in val_loader:
            img = jnp.asarray(batch["img"].astype(np.float32))
            label = jnp.asarray(batch["label"])
            ls, cs = val_step(eval_params, img, label, eval_res)
            linear_m.add_stats(ls)
            cluster_m.add_stats(cs)
        tb = {**linear_m.compute(), **cluster_m.compute()}
        for k, v in tb.items():
            mk = k.replace("test/", "test/Max", 1)
            if v > maxima.get(mk, -1):
                maxima[mk] = v
        tb.update(maxima)
        tb["step"] = step_num
        print(json.dumps(tb))
        log_file.write(json.dumps(tb) + "\n")
        log_file.flush()
        if wandb is not None:
            wandb.log(tb, step=step_num)
        if tb_writer is not None:
            for k, v in tb.items():
                tb_writer.add_scalar(k, v, step_num)
        return tb

    if tb_writer is not None:
        # on_train_start hyperparameter logging (reference
        # src/train_segmentation.py:464-469: log_hyperparams(cfg, metrics));
        # scalar-valued cfg keys land in the tfevents hparams plugin
        hparams = {k: v for k, v in cfg.items()
                   if isinstance(v, (bool, int, float, str))}
        tb_writer.add_hparams(hparams, {monitor: 0.0}, run_name=".")

    print(f"training {cfg.dataset_name} for {cfg.max_steps} steps "
          f"(n_classes={n_classes}, mesh={mesh.devices.size} devices)")
    step_num = start_step
    t_last = time.time()
    pending_logs = None
    from depthg_tpu.data.loader import device_prefetch

    while step_num < cfg.max_steps:
        # double-buffered host->HBM staging: batch k+1 transfers while step k
        # runs (device_put is async; staging thread overlaps the host work)
        for batch in device_prefetch(iter(train_loader), device_batch,
                                     depth=int(cfg.get("device_prefetch", 2))):
            if step_num >= cfg.max_steps:
                break
            mode, s = decay_lib.sampling_schedule(dcfg, step_num)
            w = decay_lib.depth_feat_weight(dcfg, step_num)
            sh = decay_lib.depth_feat_shift(dcfg, step_num)
            key = jax.random.fold_in(jax.random.PRNGKey(seed), step_num)
            hist_freq = cfg.get("hist_freq")
            want_hist = (tb_writer is not None and hist_freq
                         and step_num > 0 and step_num % int(hist_freq) == 0)
            state, logs = jstep(state, batch, key, w, sh, mode, s,
                                hist=bool(want_hist))
            step_num += 1

            if want_hist:
                host_logs = jax.device_get(logs)
                for name_ in ("intra_cd", "inter_cd", "neg_cd"):
                    # only emitted when the correlation loss ran
                    # (correspondence_weight > 0)
                    if f"hist/{name_}" in host_logs:
                        tb_writer.add_histogram(name_, np.asarray(
                            host_logs.pop(f"hist/{name_}")), step_num)
                logs = {k: v for k, v in logs.items() if not k.startswith("hist/")}

            if step_num % cfg.scalar_log_freq == 0:
                pending_logs = (step_num, logs)  # fetch lazily, off the hot path
            if pending_logs and step_num % (cfg.scalar_log_freq * 5) == 0:
                sn, lg = pending_logs
                host = {k: float(v) for k, v in jax.device_get(lg).items()}
                host.update({"step": sn, "cfg/depth_feat_weight": w,
                             "cfg/depth_feat_shift": sh, "cfg/feature_samples": s,
                             "steps_per_sec": cfg.scalar_log_freq * 5 / (time.time() - t_last)})
                t_last = time.time()
                log_file.write(json.dumps(host) + "\n")
                log_file.flush()
                if tb_writer is not None:
                    for k, v in host.items():
                        tb_writer.add_scalar(k, v, sn)
                pending_logs = None

            if (tb_writer is not None and step_num % 2000 == 0 and step_num > 0):
                # new tfevents file every 2000 steps (reference
                # src/train_segmentation.py:457-460)
                from torch.utils.tensorboard import SummaryWriter

                tb_writer.close()
                tb_writer = SummaryWriter(log_dir=tb_dir)

            if cfg.get("reset_probe_steps") is not None and step_num == cfg.reset_probe_steps:
                state = step_lib.reset_probes(state, jax.random.fold_in(
                    jax.random.PRNGKey(seed), -1), fcfg, hp)

            if step_num % cfg.val_freq == 0:
                tb = run_validation(step_num)
                if tb[monitor] > best_monitor:
                    best_monitor = tb[monitor]
                    save_ckpt("best", tb)
                save_topk(step_num, tb[monitor], tb)
                save_ckpt("last", tb)

    tb = run_validation(step_num)
    save_ckpt("last", tb)
    if tb_writer is not None:
        tb_writer.close()
    print(f"done. best {monitor}: {max(best_monitor, tb[monitor]):.3f}")
    print(f"checkpoints: {checkpoint_dir}")


if __name__ == "__main__":
    main()
