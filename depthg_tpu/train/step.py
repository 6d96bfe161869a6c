"""The DepthG training step: one jitted, mesh-shardable pure function.

Reproduces the math of the reference ``training_step``
(``src/train_segmentation.py:169-462``) with a TPU-native structure:

* the frozen ViT params live in a separate ``frozen`` branch of the state so
  no gradient or optimizer state is ever materialized for them;
* three optax Adam optimizers (net head / linear probe / cluster probe),
  mirroring ``configure_optimizers`` (``src/train_segmentation.py:537-547``);
  probe losses consume ``stop_gradient(code)`` so a single ``jax.grad`` over
  the trainable groups reproduces the manual three-optimizer isolation;
* decayed scalars (depth weight/shift) enter as jit scalars; shape-affecting
  schedule values (feature_samples, sampling mode) select a jit bucket
  (see ``train.decay``);
* batch-sharded across a ``Mesh`` by annotating the batch axis — XLA inserts
  the psum for gradient reduction (the DP replacement for Lightning's
  single-GPU loop).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from depthg_tpu.models import featurizer as featurizer_lib
from depthg_tpu.models import probes
from depthg_tpu.ops.correlation import norm
from depthg_tpu.ops.resize import resize_bilinear
from depthg_tpu.ops.sampling import sample
from depthg_tpu.train import losses as loss_lib


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    """Static hyperparameters of the training objective."""
    n_classes: int
    pos_inter_weight: float = 0.25
    pos_intra_weight: float = 0.67
    neg_inter_weight: float = 0.63
    correspondence_weight: float = 1.0
    rec_weight: float = 0.0
    aug_alignment_weight: float = 0.0
    crf_weight: float = 0.0
    lr: float = 5e-4
    probe_lr: float = 5e-3
    use_depth: bool = True
    use_true_labels: bool = False
    use_depth_only_intra: bool = False
    extra_clusters: int = 0
    # LHP (reference src/train_segmentation.py:202-344); the LHP projection
    # head is NOT in any optimizer in the reference (configure_optimizers only
    # takes net[, decoder]) — it stays at init, preserved here by keeping its
    # params in the non-optimized branch of the state.
    lhp: bool = False
    lhp_weight: float = 0.2
    lhp_depth_weight: float = 1.0
    lhp_weight_balance: bool = False
    lhp_original_experiment: bool = False  # experiment_name contains "lhp_original"
    lhp_propagation_strategy: str = "depth"
    # backbone matmul precision: None = MXU default; "float32" for parity runs
    precision: str | None = None
    # run the img / img_pos featurizer forwards as ONE stacked [2B] pass:
    # same per-sample math (dropout masks stay per-sample; no batch-coupled
    # ops in the ViT archs). Auto-disabled where semantics would change:
    # LHP attn propagation (needs the [N,N] attn of the FIRST forward only)
    # and the pyramid arch (BatchNorm batch statistics are per-forward in
    # the reference). False everywhere since r5: the stacked pass measured
    # SLOWER than two sequential [B] passes on v5e (29.7 vs 24.6 ms/step at
    # batch 16 @224 bf16 — per-image backbone cost grows with GEMM batch),
    # and with dropout enabled it also draws masks from ONE key instead of
    # k1/k2. Kept as an explicit opt-in for single-dispatch shapes.
    fused_pair_forward: bool = False
    # frozen-backbone storage dtype: "bfloat16" halves the dominant cost of
    # the step (the two stop-gradient ViT forwards — measured 21.6 -> 10.8
    # ms/pass at batch 16 @224 on v5e); training outcomes match f32
    # (docs/BF16_TRAIN_STUDY.md), so the CONFIG default (train_config.yml /
    # hparams_from_cfg) is bf16. The dataclass default stays float32 so
    # parity harnesses and golden tests constructing TrainHParams directly
    # keep reference numerics.
    backbone_dtype: str = "float32"
    # return raw correlation tensors in logs for TB histograms (hist_freq)
    log_hist: bool = False
    # ContrastiveCRFLoss constants (crf_weight>0 path)
    crf_samples: int = 1000
    alpha: float = 0.5
    beta: float = 0.15
    gamma: float = 0.05
    w1: float = 10.0
    w2: float = 3.0
    shift: float = 0.0


def hparams_from_cfg(cfg, n_classes: int) -> TrainHParams:
    return TrainHParams(
        n_classes=n_classes,
        pos_inter_weight=float(cfg.pos_inter_weight),
        pos_intra_weight=float(cfg.pos_intra_weight),
        neg_inter_weight=float(cfg.neg_inter_weight),
        correspondence_weight=float(cfg.correspondence_weight),
        rec_weight=float(cfg.rec_weight),
        aug_alignment_weight=float(cfg.aug_alignment_weight),
        crf_weight=float(cfg.crf_weight),
        lr=float(cfg.lr),
        use_depth=bool(cfg.use_depth),
        use_true_labels=bool(cfg.use_true_labels),
        use_depth_only_intra=bool(cfg.get("use_depth_only_intra", False)),
        extra_clusters=int(cfg.extra_clusters),
        lhp=bool(cfg.get("lhp", False)),
        lhp_weight=float(cfg.get("lhp_weight", 0.2)),
        lhp_depth_weight=float(cfg.get("lhp_depth_weight", 1.0)),
        lhp_weight_balance=bool(cfg.get("lhp_weight_balance", False)),
        lhp_original_experiment="lhp_original" in str(cfg.get("experiment_name", "")),
        lhp_propagation_strategy=str(cfg.get("propagation_strategy", "depth")),
        precision=cfg.get("matmul_precision"),
        # config-level default is bf16 (docs/BF16_TRAIN_STUDY.md: training
        # outcomes match f32 at ~1.6x the step rate); the DATACLASS default
        # stays f32 so parity harnesses constructing TrainHParams directly
        # keep reference numerics
        backbone_dtype=str(cfg.get("backbone_dtype", "bfloat16")),
        # False since r5: the stacked [2B] pass measured SLOWER than two
        # sequential [B] passes on v5e (29.7 vs 24.6 ms/step at batch 16
        # @224 bf16 — per-image backbone time degrades with GEMM batch),
        # mirroring the eval-side fused_tta finding (inference.EvalConfig)
        fused_pair_forward=bool(cfg.get("fused_pair_forward", False)),
        crf_samples=int(cfg.crf_samples),
        alpha=float(cfg.alpha), beta=float(cfg.beta), gamma=float(cfg.gamma),
        w1=float(cfg.w1), w2=float(cfg.w2), shift=float(cfg.shift),
    )


def make_optimizers(hp: TrainHParams):
    return {
        "net": optax.adam(hp.lr),
        "linear": optax.adam(hp.probe_lr),
        "cluster": optax.adam(hp.probe_lr),
    }


def _is_depth_arch(fcfg) -> bool:
    from depthg_tpu.models.featurizer_depth import DepthFeaturizerConfig

    return isinstance(fcfg, DepthFeaturizerConfig)


_apply_featurizer = featurizer_lib.dispatch_apply


def init_state(key: jax.Array, fcfg: featurizer_lib.FeaturizerConfig,
               hp: TrainHParams) -> dict:
    """Build the full train state pytree."""
    from depthg_tpu.models.pyramid import PyramidConfig

    kf, kl, kc, kd, kt = jax.random.split(key, 5)
    if isinstance(fcfg, PyramidConfig):
        from depthg_tpu.models.pyramid import pyramid_featurizer_init

        net = pyramid_featurizer_init(kf, fcfg)
    elif _is_depth_arch(fcfg):
        from depthg_tpu.models.featurizer_depth import depth_featurizer_init

        net = depth_featurizer_init(kf, fcfg)
    else:
        net = featurizer_lib.featurizer_init(kf, fcfg)
    frozen = {"vit": net.pop("vit")}
    if hp.lhp:
        from depthg_tpu.models.lhp import LHPConfig, lhp_init

        # LHP head is never optimized in the reference -> lives in `frozen`
        frozen["lhp"] = lhp_init(kt, LHPConfig(
            dim=fcfg.dim, propagation_strategy=hp.lhp_propagation_strategy,
            original=hp.lhp_original_experiment))
    params = {
        "net": net,  # cluster1 [+ cluster2] projection head
        "linear_probe": probes.linear_probe_init(kl, fcfg.dim, hp.n_classes),
        "cluster_probe": probes.cluster_lookup_init(kc, fcfg.dim,
                                                    hp.n_classes + hp.extra_clusters),
        "decoder": probes.decoder_init(kd, fcfg.dim, fcfg.n_feats),
    }
    # train_cluster_probe exists in the reference but is never optimized; we
    # keep a slot for checkpoint-format compatibility only.
    opts = make_optimizers(hp)
    opt_state = {
        "net": opts["net"].init(_net_group(params, hp)),
        "linear": opts["linear"].init(params["linear_probe"]),
        "cluster": opts["cluster"].init(params["cluster_probe"]),
    }
    return {"params": params, "frozen": frozen, "opt": opt_state,
            "step": jnp.zeros((), jnp.int32)}


def _net_group(params: dict, hp: TrainHParams) -> dict:
    g = {"net": params["net"]}
    if hp.rec_weight > 0:
        g["decoder"] = params["decoder"]
    return g


def cross_entropy_masked(logits: jnp.ndarray, labels: jnp.ndarray, n_classes: int,
                         class_axis: int = -1):
    """torch CrossEntropyLoss over pixels with labels in [0, n_classes).

    ``class_axis=1`` takes NCHW logits directly — on TPU the class axis must
    NOT be the minor (lane) dimension: a [B, H, W, 27] layout pads 27 lanes
    to 128 and the transposed full-res log-softmax measured 12.6 ms/batch-16
    vs 0.28 ms for identical axis-1 math (bit-identical loss value). The
    reference computes the same quantity channel-first
    (``src/train_segmentation.py:426-438``).
    """
    logits = logits.astype(jnp.float32)
    if class_axis in (-1, logits.ndim - 1):
        logits = jnp.moveaxis(logits, -1, 1)
    elif class_axis != 1:
        raise ValueError(f"class_axis must be 1 or -1, got {class_axis}")
    lse = jax.nn.logsumexp(logits, axis=1)
    mask = (labels >= 0) & (labels < n_classes)
    safe = jnp.clip(labels, 0, n_classes - 1)
    cls = jnp.arange(n_classes, dtype=safe.dtype).reshape(
        (1, n_classes) + (1,) * (logits.ndim - 2))
    onehot = cls == safe[:, None]
    picked = jnp.sum(jnp.where(onehot, logits, 0.0), axis=1)
    nll = jnp.where(mask, lse - picked, 0.0)
    return nll.sum() / jnp.maximum(mask.sum(), 1)


def loss_fn(trainable: dict, frozen: dict, batch: dict, key: jax.Array,
            fcfg: featurizer_lib.FeaturizerConfig, hp: TrainHParams,
            lcfg: loss_lib.CorrLossConfig, depth_feat_weight: float,
            depth_feat_shift: float):
    """Total loss + metrics; differentiable w.r.t. ``trainable`` only."""
    params = {"net": dict(trainable["net"], vit=frozen["vit"]),
              **{k: v for k, v in trainable.items() if k != "net"}}
    net_params = params["net"]

    img = batch["img"]
    label = batch["label"]
    depth = batch.get("depth")
    depth_pos = batch.get("depth_pos")

    k1, k2, k3, k3b, k4, k5 = jax.random.split(key, 6)
    # the attn matrix's VALUES are consumed only by LHP attn propagation
    # (the "depth" strategy's guard is strategy-aware — models/lhp.py);
    # keeping need_attn False otherwise lets the backbone take the fused
    # flash-attention path
    need_attn = hp.lhp and hp.lhp_propagation_strategy == "attn"
    bdt = None if hp.backbone_dtype == "float32" else hp.backbone_dtype
    from depthg_tpu.models.pyramid import PyramidConfig

    fuse_pair = (hp.fused_pair_forward and hp.correspondence_weight > 0
                 and not need_attn and not isinstance(fcfg, PyramidConfig)
                 # one-sided depth can't ride the stacked pass (the concat
                 # below would silently drop the present side's guidance);
                 # the shipped loader always provides both or neither
                 and (depth is None) == (depth_pos is None))
    out_pos_fused = None
    if fuse_pair:
        # one stacked [2B] frozen forward for img + img_pos (see
        # TrainHParams.fused_pair_forward); dropout masks come from ONE key
        # but stay independent per sample, so only the rng stream differs
        # from the two-forward structure — not the semantics
        b = img.shape[0]
        both = jnp.concatenate([img, batch["img_pos"]], axis=0)
        depth_both = (jnp.concatenate([depth, depth_pos], axis=0)
                      if depth is not None and depth_pos is not None else None)
        out_both = _apply_featurizer(net_params, both, fcfg, depth=depth_both,
                                     key=k1, train=True, precision=hp.precision,
                                     need_attn=False, backbone_dtype=bdt)
        out = {"feats": out_both["feats"][:b], "code": out_both["code"][:b],
               "attn": None}
        out_pos_fused = {"feats": out_both["feats"][b:],
                         "code": out_both["code"][b:]}
    else:
        out = _apply_featurizer(net_params, img, fcfg, depth=depth, key=k1,
                                train=True, precision=hp.precision,
                                need_attn=need_attn, backbone_dtype=bdt)
    feats, code = out["feats"], out["code"]

    logs: dict[str, Any] = {}
    loss = 0.0
    # pyramid DoubleConv BN batch stats, in forward order (running-stat EMA is
    # applied by train_step after the gradient step — torch updates them on
    # every train-mode forward, outside autograd)
    bn_stats_list = []
    if "bn_stats" in out:
        bn_stats_list.append(out["bn_stats"])

    lhp_code = lhp_code_pos = None
    if hp.lhp:
        from depthg_tpu.models.lhp import LHPConfig, lhp_apply

        lhp_cfg = LHPConfig(dim=fcfg.dim,
                            propagation_strategy=hp.lhp_propagation_strategy,
                            original=hp.lhp_original_experiment)
        lhp_code = lhp_apply(frozen["lhp"], lhp_cfg, code, depth, img, out["attn"])

    if hp.correspondence_weight > 0:
        out_pos = out_pos_fused if out_pos_fused is not None else \
            _apply_featurizer(net_params, batch["img_pos"], fcfg,
                              depth=depth_pos, key=k2, train=True,
                              precision=hp.precision, backbone_dtype=bdt)
        feats_pos, code_pos = out_pos["feats"], out_pos["code"]
        if "bn_stats" in out_pos:
            bn_stats_list.append(out_pos["bn_stats"])
        if hp.lhp:
            # positive side: projection-only (reference passes depth=None,
            # src/train_segmentation.py:215)
            lhp_code_pos = lhp_apply(frozen["lhp"], lhp_cfg, code_pos)

        if hp.use_true_labels:
            signal = jax.nn.one_hot(label + 1, hp.n_classes + 1, axis=1, dtype=jnp.float32)
            signal_pos = jax.nn.one_hot(batch["label_pos"] + 1, hp.n_classes + 1,
                                        axis=1, dtype=jnp.float32)
        else:
            signal, signal_pos = feats, feats_pos

        def corr_loss(k, c, c_pos):
            if hp.use_depth_only_intra:
                # depth-augmented feats drive pos_intra; with the dino_depth
                # arch these are the fused features (the reference's call
                # signature for this path is inconsistent — see train.losses)
                return loss_lib.depth_contrastive_correlation_loss(
                    k, lcfg, signal, signal_pos, c, c_pos,
                    depth_aug_feats=feats, depth_aug_feats_pos=feats_pos,
                    salience=batch.get("mask"), salience_pos=batch.get("mask_pos"))
            return loss_lib.contrastive_correlation_loss(
                k, lcfg, signal, signal_pos, c, c_pos,
                depth=depth, depth_pos=depth_pos,
                salience=batch.get("mask"), salience_pos=batch.get("mask_pos"),
                depth_feat_shift=depth_feat_shift)

        corr = corr_loss(k3, code, code_pos)

        pos_intra = corr["pos_intra_loss"]
        pos_inter = corr["pos_inter_loss"]
        neg_inter = corr["neg_inter_loss"].mean()
        logs.update({
            "loss/pos_intra": pos_intra, "loss/pos_inter": pos_inter,
            "loss/neg_inter": neg_inter,
            "cd/pos_intra": corr["pos_intra_cd"].mean(),
            "cd/pos_inter": corr["pos_inter_cd"].mean(),
            "cd/neg_inter": corr["neg_inter_cd"].mean(),
        })
        if hp.log_hist:
            # raw correlation tensors for TensorBoard histograms (reference
            # src/train_segmentation.py:298-301); static flag -> this jit
            # bucket is only compiled/used on hist_freq steps
            logs["hist/intra_cd"] = corr["pos_intra_cd"]
            logs["hist/inter_cd"] = corr["pos_inter_cd"]
            logs["hist/neg_cd"] = corr["neg_inter_cd"]
        corr_total = (hp.pos_inter_weight * pos_inter
                      + hp.pos_intra_weight * pos_intra
                      + hp.neg_inter_weight * neg_inter)
        has_df = lcfg.depth_feat_correlation_loss and not hp.use_depth_only_intra
        if has_df:
            df = corr["depth_feat_loss"]
            logs["loss/depth_feat"] = df
            logs["cd/depth_feat"] = corr["depth_feat_cd"].mean()
            corr_total = corr_total + depth_feat_weight * df

        if hp.lhp:
            # balance/zeroing semantics: src/train_segmentation.py:325-344;
            # the lhp_original zeroing only exists inside the depth-feat
            # branch in the reference (line 336-338)
            balance = hp.lhp_weight if (has_df and hp.lhp_weight_balance) else 0.0
            lhp_weight = hp.lhp_weight
            main_scale = hp.correspondence_weight - balance if has_df else hp.correspondence_weight
            if hp.lhp_original_experiment and has_df:
                main_scale = 0.0
                lhp_weight = 1.0
            loss = loss + corr_total * main_scale

            lhp_corr = corr_loss(k3b, lhp_code, lhp_code_pos)
            lhp_total = (hp.pos_inter_weight * lhp_corr["pos_inter_loss"]
                         + hp.pos_intra_weight * lhp_corr["pos_intra_loss"]
                         + hp.neg_inter_weight * lhp_corr["neg_inter_loss"].mean())
            if has_df:
                lhp_total = lhp_total + (depth_feat_weight * hp.lhp_depth_weight
                                         * lhp_corr["depth_feat_loss"])
            loss = loss + lhp_total * lhp_weight
            logs["loss/lhp_pos_intra"] = lhp_corr["pos_intra_loss"]
            logs["loss/lhp_pos_inter"] = lhp_corr["pos_inter_loss"]
        else:
            loss = loss + corr_total * hp.correspondence_weight

    if hp.rec_weight > 0:
        rec_feats = probes.decoder_apply(params["decoder"], code)
        rec_loss = -jnp.mean(jnp.sum(norm(rec_feats) * norm(feats), axis=1))
        logs["loss/rec"] = rec_loss
        loss = loss + hp.rec_weight * rec_loss

    if hp.aug_alignment_weight > 0:
        out_aug = _apply_featurizer(net_params, batch["img_aug"], fcfg,
                                    key=k4, train=True, precision=hp.precision,
                                    backbone_dtype=bdt)
        code_aug = out_aug["code"]
        if "bn_stats" in out_aug:
            bn_stats_list.append(out_aug["bn_stats"])
        coord_aug = jnp.transpose(batch["coord_aug"], (0, 3, 1, 2))
        down = resize_bilinear(coord_aug, code_aug.shape[2])
        down = jnp.transpose(down, (0, 2, 3, 1))
        aug_alignment = -jnp.mean(jnp.einsum(
            "bkhw,bkhw->bhw", norm(sample(code, down)), norm(code_aug)))
        logs["loss/aug_alignment"] = aug_alignment
        loss = loss + hp.aug_alignment_weight * aug_alignment

    if hp.crf_weight > 0:
        crf = loss_lib.contrastive_crf_loss(
            k5, resize_bilinear(img, 56), norm(resize_bilinear(code, 56)),
            hp.crf_samples, hp.alpha, hp.beta, hp.gamma, hp.w1, hp.w2, hp.shift).mean()
        logs["loss/crf"] = crf
        loss = loss + hp.crf_weight * crf

    detached_code = jax.lax.stop_gradient(code)

    linear_logits = probes.linear_probe_apply(params["linear_probe"], detached_code)
    linear_logits = resize_bilinear(linear_logits, label.shape[-2:])
    linear_loss = cross_entropy_masked(linear_logits, label, hp.n_classes,
                                       class_axis=1)
    logs["loss/linear"] = linear_loss
    loss = loss + linear_loss

    cluster_loss, _ = probes.cluster_lookup_apply(params["cluster_probe"],
                                                  detached_code, None)
    logs["loss/cluster"] = cluster_loss
    loss = loss + cluster_loss
    logs["loss/total"] = loss
    if bn_stats_list:
        logs["aux/bn_stats"] = bn_stats_list
    return loss, logs


def train_step(state: dict, batch: dict, key: jax.Array,
               fcfg: featurizer_lib.FeaturizerConfig, hp: TrainHParams,
               lcfg: loss_lib.CorrLossConfig,
               depth_feat_weight, depth_feat_shift):
    """One optimization step. Static args: fcfg/hp/lcfg. Jit-wrapped by caller."""
    params = state["params"]
    trainable = {
        "net": params["net"],
        "linear_probe": params["linear_probe"],
        "cluster_probe": params["cluster_probe"],
        "decoder": params["decoder"],
    }
    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        trainable, state["frozen"], batch, key, fcfg, hp, lcfg,
        depth_feat_weight, depth_feat_shift)
    logs = dict(logs)
    bn_stats_list = logs.pop("aux/bn_stats", None)

    opts = make_optimizers(hp)
    net_grads = _net_group(grads, hp)
    net_updates, net_opt = opts["net"].update(
        net_grads, state["opt"]["net"], _net_group(params, hp))
    lin_updates, lin_opt = opts["linear"].update(
        grads["linear_probe"], state["opt"]["linear"], params["linear_probe"])
    clu_updates, clu_opt = opts["cluster"].update(
        grads["cluster_probe"], state["opt"]["cluster"], params["cluster_probe"])

    new_net_group = optax.apply_updates(_net_group(params, hp), net_updates)
    new_params = dict(params)
    new_params["net"] = new_net_group["net"]
    if hp.rec_weight > 0:
        new_params["decoder"] = new_net_group["decoder"]
    new_params["linear_probe"] = optax.apply_updates(params["linear_probe"], lin_updates)
    new_params["cluster_probe"] = optax.apply_updates(params["cluster_probe"], clu_updates)
    if bn_stats_list:
        from depthg_tpu.models.pyramid import merge_bn_stats

        new_params["net"] = merge_bn_stats(new_params["net"], bn_stats_list,
                                           getattr(fcfg, "bn_momentum", 0.1))

    new_state = {
        "params": new_params,
        "frozen": state["frozen"],
        "opt": {"net": net_opt, "linear": lin_opt, "cluster": clu_opt},
        "step": state["step"] + 1,
    }
    return new_state, logs


def eval_params_from_state(state: dict) -> dict:
    """Merge the frozen backbone back into the canonical segmenter param layout
    used by inference / checkpoints: {"net": {vit, cluster1[, cluster2]},
    "linear_probe", "cluster_probe", "decoder"}."""
    params = state["params"]
    return {
        "net": {**params["net"], **state["frozen"]},
        "linear_probe": params["linear_probe"],
        "cluster_probe": params["cluster_probe"],
        "decoder": params["decoder"],
    }


def reset_probes(state: dict, key: jax.Array, fcfg, hp: TrainHParams) -> dict:
    """Reference ``reset_probe_steps`` behavior (``src/train_segmentation.py:451-455``):
    re-init both probes and their optimizer states."""
    kl, kc = jax.random.split(key)
    params = dict(state["params"])
    params["linear_probe"] = probes.linear_probe_init(kl, fcfg.dim, hp.n_classes)
    params["cluster_probe"] = probes.cluster_lookup_init(
        kc, fcfg.dim, hp.n_classes + hp.extra_clusters)
    opts = make_optimizers(hp)
    opt = dict(state["opt"])
    opt["linear"] = opts["linear"].init(params["linear_probe"])
    opt["cluster"] = opts["cluster"].init(params["cluster_probe"])
    return {**state, "params": params, "opt": opt}
