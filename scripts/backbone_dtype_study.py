"""Training-quality study across frozen-backbone dtypes (f32/bf16/int8).

The frozen ViT's two stop-gradient forwards are the dominant train-step cost
(docs/PERFORMANCE.md). Storing/running the frozen backbone in bfloat16 cuts
the step ~1.6x (bench.py), but the reference trains in f32 — so flipping the
default needs evidence that training OUTCOMES match, not just that features
deviate ~1%.

This script runs the full depth-guided training objective (paper recipe of
``paper_reproduction.sh:4``: fps sampling, feature_samples 11, neg 5,
depth-feat correlation) on a synthetic 6-class color/depth dataset where
color and depth are class-informative, for N seeds x each ``--arms``
backbone dtype, same data and batch schedule per seed, and reports:

* the loss curve (mean total loss per 30-step window),
* final held-out linear-probe and cluster-probe mIoU / Accuracy
  (Hungarian-matched, the eval metric),
* the f32-vs-bf16 delta per seed and aggregate.

The whole dataset lives on device and steps run in ``lax.scan`` chains of
CHUNK steps per dispatch, so tunnel dispatch latency doesn't serialize the
study. Run on the real TPU (this is a numerics study — CPU would miss MXU
behavior):

    python scripts/backbone_dtype_study.py [--seeds 3] [--steps 300]
        [--out docs/BF16_TRAIN_STUDY.md] [--arms float32,bfloat16,int8]

``--arms`` selects the backbone_dtype arms (default f32 vs bf16; add
``int8`` to study the w8a8 quantized backbone the same way).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(n, size, n_classes, seed, noise=8.0):
    """Learnable scenes: Voronoi regions, class-consistent colors, depth =
    class-correlated smooth field. Returns imgs [N,3,S,S] (ImageNet-normed),
    depth [N,1,S,S] in [0,1], labels [N,S,S]."""
    rng = np.random.default_rng(seed)
    colors = np.linspace(30, 225, n_classes)[:, None].repeat(3, 1)
    colors += rng.uniform(-25, 25, colors.shape)
    depth_level = rng.permutation(np.linspace(0.15, 0.9, n_classes))
    imgs = np.empty((n, 3, size, size), np.float32)
    depths = np.empty((n, 1, size, size), np.float32)
    labels = np.empty((n, size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for i in range(n):
        pts = rng.uniform(0, size, (8, 2)).astype(np.float32)
        cls = rng.integers(0, n_classes, 8)
        d2 = ((yy[None] - pts[:, 0, None, None]) ** 2
              + (xx[None] - pts[:, 1, None, None]) ** 2)
        region = d2.argmin(0)
        lab = cls[region]
        img = colors[lab].transpose(2, 0, 1).astype(np.float32)
        img += rng.normal(0, noise, img.shape).astype(np.float32)
        img = np.clip(img, 0, 255) / 255.0
        mean = np.array([0.485, 0.456, 0.406], np.float32)[:, None, None]
        std = np.array([0.229, 0.224, 0.225], np.float32)[:, None, None]
        imgs[i] = (img - mean) / std
        d = depth_level[lab] + rng.normal(0, 0.02, lab.shape)
        depths[i] = np.clip(d, 0, 1)[None]
        labels[i] = lab
    return imgs, depths, labels


def run_one(backbone_dtype, seed, steps, chunk, batch, res, n_train, n_val,
            n_classes=6, eval_arms=("float32", "bfloat16")):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.inference import make_validation_step
    from depthg_tpu.models.featurizer import FeaturizerConfig
    from depthg_tpu.parallel.knn import pooled_features, topk_neighbors
    from depthg_tpu.train import losses as loss_lib
    from depthg_tpu.train import step as step_lib
    from depthg_tpu.utils.metrics import SegMetrics

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
    hp = step_lib.TrainHParams(n_classes=n_classes,
                               backbone_dtype=backbone_dtype)
    # paper COCO-Stuff ViT-S recipe (paper_reproduction.sh:4)
    lcfg = loss_lib.CorrLossConfig(feature_samples=11, neg_samples=5,
                                   depth_sampling="fps",
                                   depth_feat_correlation_loss=True)

    imgs, depths, labels = make_dataset(n_train + n_val, res, n_classes, 100)
    tr = slice(0, n_train)
    va = slice(n_train, n_train + n_val)

    state = step_lib.init_state(jax.random.PRNGKey(seed), fcfg, hp)

    d_imgs = jnp.asarray(imgs[tr])
    d_depths = jnp.asarray(depths[tr])
    d_labels = jnp.asarray(labels[tr])

    # KNN positives over pooled backbone features (precompute_knns semantics)
    pf = jax.jit(lambda im: pooled_features(
        {"vit": state["frozen"]["vit"]}, im, fcfg))
    pooled = jnp.concatenate([pf(d_imgs[i:i + 16]) for i in range(0, n_train, 16)])
    nns = jnp.asarray(topk_neighbors(pooled, k=7))  # [N, 7], rank 0 = self

    def pick_batch(key):
        k1, k2 = jax.random.split(key)
        idx = jax.random.choice(k1, n_train, (batch,), replace=False)
        ranks = jax.random.randint(k2, (batch,), 1, nns.shape[1])
        pos = nns[idx, ranks]
        return {
            "img": d_imgs[idx], "img_pos": d_imgs[pos],
            "label": d_labels[idx],
            "depth": d_depths[idx], "depth_pos": d_depths[pos],
        }

    @jax.jit
    def run_chunk(state, base_key):
        def body(st, i):
            key = jax.random.fold_in(base_key, i)
            st, logs = step_lib.train_step(st, pick_batch(key), key, fcfg, hp,
                                           lcfg, 0.19, 0.03)
            return st, logs["loss/total"]
        return jax.lax.scan(body, state, jnp.arange(chunk))

    losses = []
    t0 = time.time()
    for c in range(steps // chunk):
        state, ls = run_chunk(state, jax.random.fold_in(
            jax.random.PRNGKey(1000 + seed), c))
        losses.append(np.asarray(ls))
    train_s = time.time() - t0
    losses = np.concatenate(losses)

    val_step = make_validation_step(fcfg, n_classes, hp.extra_clusters)
    eval_params = step_lib.eval_params_from_state(state)
    lin_m = SegMetrics("linear/", n_classes, 0, False)
    clu_m = SegMetrics("cluster/", n_classes, 0, True)
    for i in range(0, n_val, 8):
        ls, cs = val_step(eval_params, jnp.asarray(imgs[va][i:i + 8]),
                          jnp.asarray(labels[va][i:i + 8]), res)
        lin_m.add_stats(ls)
        clu_m.add_stats(cs)
    metrics = {**lin_m.compute(), **clu_m.compute()}

    # eval-path dtype arm: SAME trained weights, forward with f32 vs bf16
    # backbone — quantifies the EVAL deviation (probe-argmax agreement +
    # metric deltas) that justifies the eval CLI's backbone_dtype default
    import functools

    from depthg_tpu.models import featurizer as featurizer_lib
    from depthg_tpu.models import probes
    from depthg_tpu.ops.resize import resize_bilinear

    @functools.partial(jax.jit, static_argnums=(2,))
    def val_preds(params, img, bdt):
        out = featurizer_lib.dispatch_apply(
            params["net"], img, fcfg,
            backbone_dtype=None if bdt == "float32" else bdt)
        code = resize_bilinear(out["code"].astype(jnp.float32), (res, res))
        lin = jnp.argmax(probes.linear_probe_apply(params["linear_probe"], code), 1)
        _, cp = probes.cluster_lookup_apply(params["cluster_probe"], code, None)
        return lin, jnp.argmax(cp, 1)

    eval_dtype = {}
    preds_by_arm = {}
    for arm in eval_arms:
        lm = SegMetrics("linear/", n_classes, 0, False)
        cm = SegMetrics("cluster/", n_classes, 0, True)
        preds_acc = []
        for i in range(0, n_val, 8):
            lin, clu = val_preds(eval_params, jnp.asarray(imgs[va][i:i + 8]), arm)
            from depthg_tpu.utils.metrics import confusion_update
            lm.add_stats(confusion_update(lin, jnp.asarray(labels[va][i:i + 8]),
                                          n_classes, 0))
            cm.add_stats(confusion_update(clu, jnp.asarray(labels[va][i:i + 8]),
                                          n_classes, hp.extra_clusters))
            preds_acc.append((np.asarray(lin), np.asarray(clu)))
        eval_dtype[arm] = {**lm.compute(), **cm.compute()}
        preds_by_arm[arm] = preds_acc
    for arm in eval_arms:
        if arm == "float32":
            continue
        eval_dtype[f"{arm}_lin_agree"] = float(np.mean(
            [(a[0] == b[0]).mean() for a, b in
             zip(preds_by_arm["float32"], preds_by_arm[arm])]))
        eval_dtype[f"{arm}_clu_agree"] = float(np.mean(
            [(a[1] == b[1]).mean() for a, b in
             zip(preds_by_arm["float32"], preds_by_arm[arm])]))
    return losses, metrics, train_s, eval_dtype


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--chunk", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--n-train", type=int, default=96)
    ap.add_argument("--n-val", type=int, default=32)
    ap.add_argument("--out", default=None)
    ap.add_argument("--arms", default="float32,bfloat16",
                    help="comma-separated backbone_dtype arms to train AND "
                         "eval (e.g. float32,bfloat16,int8)")
    args = ap.parse_args(argv)
    arms = tuple(args.arms.split(","))
    if "float32" not in arms:
        arms = ("float32",) + arms  # the agreement baseline

    import jax

    rows = []
    curves = {}
    eval_rows = []
    for dtype in arms:
        for seed in range(args.seeds):
            losses, metrics, train_s, eval_dtype = run_one(
                dtype, seed, args.steps, args.chunk, args.batch, args.res,
                args.n_train, args.n_val, eval_arms=arms)
            rows.append({"dtype": dtype, "seed": seed,
                         "lin_miou": metrics["linear/mIoU"],
                         "lin_acc": metrics["linear/Accuracy"],
                         "clu_miou": metrics["cluster/mIoU"],
                         "clu_acc": metrics["cluster/Accuracy"],
                         "final_loss": float(losses[-args.chunk:].mean()),
                         "train_s": train_s})
            eval_rows.append({"dtype": dtype, "seed": seed, **{
                f"{arm}_{k.split('/')[0]}": eval_dtype[arm][k]
                for arm in arms for k in ("linear/mIoU", "cluster/mIoU")}, **{
                f"{arm}_{p}_agree": eval_dtype[f"{arm}_{p}_agree"]
                for arm in arms if arm != "float32" for p in ("lin", "clu")}})
            curves[(dtype, seed)] = losses.reshape(-1, args.chunk).mean(1)
            print(f"{dtype} seed {seed}: lin mIoU {metrics['linear/mIoU']:.2f} "
                  f"Acc {metrics['linear/Accuracy']:.2f} | clu mIoU "
                  f"{metrics['cluster/mIoU']:.2f} Acc "
                  f"{metrics['cluster/Accuracy']:.2f} | loss "
                  f"{rows[-1]['final_loss']:.4f} | {train_s:.0f}s")

    lines = [
        f"# Backbone dtype training-quality study ({' vs '.join(arms)} "
        "frozen ViT)",
        "",
        f"Generated by `scripts/backbone_dtype_study.py` on "
        f"`{jax.devices()[0].platform}` — {args.seeds} seeds x "
        f"{args.steps} steps, batch {args.batch} @ {args.res}px, paper "
        "COCO-Stuff ViT-S recipe (fps sampling, feature_samples 11, "
        "neg_samples 5, depth-feat correlation) on a synthetic 6-class "
        "color+depth dataset (class-consistent colors and depth, KNN "
        "positives from pooled backbone features). Same data and batch "
        "schedule per seed; only the frozen-backbone dtype differs.",
        "",
        "| dtype | seed | linear mIoU | linear Acc | cluster mIoU | "
        "cluster Acc | final loss (last window) |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['dtype']} | {r['seed']} | {r['lin_miou']:.2f} | "
                     f"{r['lin_acc']:.2f} | {r['clu_miou']:.2f} | "
                     f"{r['clu_acc']:.2f} | {r['final_loss']:.4f} |")
    lines.append("")
    for metric, label in (("lin_miou", "linear mIoU"), ("lin_acc", "linear Acc"),
                          ("clu_miou", "cluster mIoU"), ("clu_acc", "cluster Acc")):
        f32 = np.array([r[metric] for r in rows if r["dtype"] == "float32"])
        parts = [f"f32 {f32.mean():.2f}±{f32.std():.2f}"]
        for arm in arms:
            if arm == "float32":
                continue
            a = np.array([r[metric] for r in rows if r["dtype"] == arm])
            parts.append(f"{arm} {a.mean():.2f}±{a.std():.2f} "
                         f"(delta {a.mean() - f32.mean():+.2f})")
        lines.append(f"* {label}: " + ", ".join(parts))
    lines += [
        "",
        "## Eval-path dtype (same trained weights, per-arm forward)",
        "",
        "Per trained model: full-resolution probe-argmax agreement between "
        "the f32-backbone eval forward and each reduced-precision arm, and "
        "the mIoU each arm yields — the deviation the eval CLI's non-f32 "
        "default costs at inference time.",
        "",
        "| train dtype | seed | arm | lin agree | clu agree | lin mIoU "
        "f32->arm | clu mIoU f32->arm |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in eval_rows:
        for arm in arms:
            if arm == "float32":
                continue
            lines.append(
                f"| {r['dtype']} | {r['seed']} | {arm} | "
                f"{r[f'{arm}_lin_agree']:.4f} | {r[f'{arm}_clu_agree']:.4f} | "
                f"{r['float32_linear']:.2f} -> {r[f'{arm}_linear']:.2f} | "
                f"{r['float32_cluster']:.2f} -> {r[f'{arm}_cluster']:.2f} |")
    lines.append("")
    for arm in arms:
        if arm == "float32":
            continue
        la = np.array([r[f"{arm}_lin_agree"] for r in eval_rows])
        ca = np.array([r[f"{arm}_clu_agree"] for r in eval_rows])
        dl = np.array([r[f"{arm}_linear"] - r["float32_linear"]
                       for r in eval_rows])
        dc = np.array([r[f"{arm}_cluster"] - r["float32_cluster"]
                       for r in eval_rows])
        lines += [f"* {arm}: agreement linear {la.mean():.4f}±{la.std():.4f}, "
                  f"cluster {ca.mean():.4f}±{ca.std():.4f}; eval-dtype mIoU "
                  f"delta linear {dl.mean():+.2f}±{dl.std():.2f}, cluster "
                  f"{dc.mean():+.2f}±{dc.std():.2f}"]
    lines += ["", "Loss curves (mean total loss per "
              f"{args.chunk}-step window):", "", "```"]
    for (dtype, seed), c in curves.items():
        lines.append(f"{dtype} seed {seed}: " +
                     " ".join(f"{v:.3f}" for v in c))
    lines += ["```", ""]
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
