"""Fused eval/demo inference pipeline.

The reference eval path (``src/eval_segmentation.py:143-187``) runs: flip-TTA
code averaging -> bilinear upsample -> linear log-softmax + cluster log-probs
(alpha=2) -> per-image CPU dense CRF -> metrics, with three host round-trips
per batch. Here the *entire* pipeline — backbone, TTA, probes, mean-field CRF
and the confusion-matrix reduction — is one jitted program per batch; only the
[K, C] confusion blocks (a few kB) ever leave the device, which matters
doubly on this setup (slow device->host link).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from depthg_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from depthg_tpu.models import featurizer as featurizer_lib
from depthg_tpu.models import probes
from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi_batch
from depthg_tpu.ops.resize import resize_bilinear
from depthg_tpu.utils.metrics import confusion_update


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    n_classes: int
    extra_clusters: int = 0
    run_crf: bool = True
    label_res: int = 320
    cluster_alpha: float = 2.0
    crf: CRFConfig = CRFConfig()
    precision: str | None = None  # backbone matmul precision (None = MXU default)
    # backbone storage dtype: "bfloat16" halves HBM traffic for the frozen ViT
    # (~30% faster eval, ~1% mean code deviation); probes/CRF stay f32.
    backbone_dtype: str = "float32"
    # number of devices the batch axis is sharded across INSIDE this step's
    # program. Under make_eval_step's shard_map the body sees the local
    # batch, so this stays 1; callers embedding predictions() in their own
    # sharded-jit program set it so the CRF batch strategy never runs a
    # lax.map across a sharded axis (see ops.crf).
    batch_shards: int = 1
    # stack the flip-TTA pair into ONE [2B] backbone forward (tta_code).
    # Same per-sample math either way. Default False since r5: the stacked
    # [2B] pass measured SLOWER than two sequential [B] passes on v5e
    # (58.6 vs 2 x 25.0 ms at batch 16 @320 bf16 — per-image backbone time
    # degrades with batch, and the fused pass also doubles peak activation
    # memory). True restores the single-dispatch form.
    fused_tta: bool = False
    # run each backbone pass over at most this many images, as UNROLLED
    # sequential sub-passes inside the same program (r5): per-image backbone
    # time grows with GEMM batch past ~16 on v5e (the same measurement that
    # retired fused_tta), so larger eval batches keep the 16-wide knee's
    # per-image cost instead of inheriting the [B]-wide degradation.
    # 0 disables chunking.
    backbone_sub_batch: int = 16
    # compute both probes from the LOW-RESOLUTION code (exact restructuring,
    # r5): the 1x1 probes commute with the separable bilinear upsample, and
    # the cluster cosine denominator |resize(code)| expands exactly through
    # the 2-tap bilinear rows (ops.resize.resized_sq_norm) — so the
    # [B, dim, R, R] resized code (917 MB f32 at batch 16) never exists.
    # Same math as the reference order (resize -> probe), pinned by
    # tests/test_inference_lowres.py; False restores the materializing path.
    lowres_probes: bool = True


def unnormalize_255(img: jnp.ndarray) -> jnp.ndarray:
    """ImageNet-normalized [B,3,H,W] -> raw 0..255 floats for CRF guidance."""
    mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
    std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
    return jnp.clip(img * std + mean, 0.0, 1.0) * 255.0


def tta_code(params: dict, img: jnp.ndarray, fcfg, precision=None,
             backbone_dtype=None, fused: bool = False,
             sub_batch: int = 0) -> jnp.ndarray:
    """Flip-TTA averaged projection code (reference ``eval_segmentation.py:150-152``).

    Eval runs the featurizer with no dropout or batch statistics, so every
    sample is independent and any batching of the two passes is the same
    per-sample math. ``fused`` stacks them into ONE [2B] forward (slower on
    v5e — see ``EvalConfig.fused_tta``); ``sub_batch > 0`` additionally
    splits each pass into unrolled sub-passes of at most that many images
    (``EvalConfig.backbone_sub_batch``: per-image backbone cost grows with
    GEMM batch past ~16, so big eval batches keep the knee's cost)."""
    def forward(x):
        b = x.shape[0]
        if sub_batch and b > sub_batch:
            chunks = [featurizer_lib.dispatch_apply(
                params, x[i:i + sub_batch], fcfg, precision=precision,
                backbone_dtype=backbone_dtype)["code"]
                for i in range(0, b, sub_batch)]
            return jnp.concatenate(chunks, axis=0)
        return featurizer_lib.dispatch_apply(params, x, fcfg, precision=precision,
                                             backbone_dtype=backbone_dtype)["code"]

    if not fused:
        c1 = forward(img)
        c2 = forward(img[..., ::-1])
        return (c1 + c2[..., ::-1]) / 2
    b = img.shape[0]
    both = jnp.concatenate([img, img[..., ::-1]], axis=0)
    code = forward(both)
    return (code[:b] + code[b:][..., ::-1]) / 2


def eval_logits(params: dict, img: jnp.ndarray, fcfg, ecfg: EvalConfig,
                normalized: bool = True):
    """Upsampled probe logits: (linear log-softmax, cluster log-probs).

    ``backbone_dtype`` goes through the featurizer's own mechanism (cast
    the frozen ViT only, return f32 features) so train and eval share ONE
    precision semantics — the projection head and probes always run f32.

    ``normalized=False`` skips the final log-softmaxes and returns raw
    (shift-equivalent) logits: softmax(log_softmax(x)) == softmax(x), so a
    caller that feeds the CRF unary (which re-softmaxes) gets the identical
    distribution without two full-resolution [B, C, R, R] normalization
    passes (``predictions`` uses this; argmax consumers are equally
    shift-invariant).
    """
    bdt = None if ecfg.backbone_dtype == "float32" else ecfg.backbone_dtype
    code = tta_code(params["net"], img, fcfg, ecfg.precision,
                    backbone_dtype=bdt, fused=ecfg.fused_tta,
                    sub_batch=ecfg.backbone_sub_batch).astype(jnp.float32)
    res = (ecfg.label_res, ecfg.label_res)

    def norm_log(x):
        return jax.nn.log_softmax(x, axis=1) if normalized else x

    if ecfg.lowres_probes:
        # probe at code resolution, upsample 27-channel logits: exact (see
        # EvalConfig.lowres_probes) and skips the [B, dim, R, R] intermediate
        linear_log = norm_log(resize_bilinear(
            probes.linear_probe_apply(params["linear_probe"], code,
                                      precision=jax.lax.Precision.HIGHEST),
            res))
        cluster_log = probes.cluster_lookup_resized(
            params["cluster_probe"], code, res, ecfg.cluster_alpha,
            normalized=normalized)
        return linear_log, cluster_log
    code = resize_bilinear(code, res)
    linear_log = norm_log(probes.linear_probe_apply(params["linear_probe"], code))
    cluster_log = probes.cluster_lookup_apply(
        params["cluster_probe"], code, alpha=ecfg.cluster_alpha, log_probs=True,
        normalized=normalized)
    return linear_log, cluster_log


def predictions(params: dict, img: jnp.ndarray, fcfg, ecfg: EvalConfig):
    """(linear_preds, cluster_preds) [B, R, R] int32, with optional CRF.

    Uses unnormalized logits throughout: the CRF unary re-softmaxes and
    argmax is shift-invariant, so the log-softmax passes are pure cost here
    (see ``eval_logits(normalized=False)``)."""
    linear_log, cluster_log = eval_logits(params, img, fcfg, ecfg,
                                          normalized=False)
    if ecfg.run_crf:
        guidance = unnormalize_255(img)
        if guidance.shape[-1] != ecfg.label_res:
            guidance = resize_bilinear(guidance, (ecfg.label_res, ecfg.label_res))
        # This CRF shares ONE XLA program with the backbone forward above,
        # so "auto" batching must resolve to vmap: on v5e, lax.map over the
        # cached-kernel coarse-prefix mean field composed with a large
        # backbone deterministically crashes the TPU worker, while the
        # identical math under vmap runs fine (bisect matrix in
        # scripts/bisect_compose.py; regression tests/test_tpu_composed_eval
        # .py). An explicit "map" override is honored — callers who split
        # eval into two dispatches get the faster sequential loop via
        # eval_logits + their own CRF program instead.
        ccfg = ecfg.crf
        if ccfg.batch_strategy == "auto":
            ccfg = dataclasses.replace(ccfg, batch_strategy="vmap")
        # one fused mean field: both probes share the image's pairwise kernel
        linear_q, cluster_q = dense_crf_multi_batch(
            guidance, [linear_log, cluster_log], ccfg,
            n_shards=ecfg.batch_shards)
        linear_preds = jnp.argmax(linear_q, 1)
        cluster_preds = jnp.argmax(cluster_q, 1)
    else:
        linear_preds = jnp.argmax(linear_log, 1)
        cluster_preds = jnp.argmax(cluster_log, 1)
    return linear_preds.astype(jnp.int32), cluster_preds.astype(jnp.int32)


def make_eval_step(fcfg, ecfg: EvalConfig, mesh=None):
    """Jitted: (params, img, label) -> (linear_stats, cluster_stats) confusion blocks.

    With a ``mesh``, the batch shards across devices and the psum-equivalent
    reduction happens inside XLA (the confusion matrices are summed over the
    batch axis, so the output is already globally correct) — the TPU
    replacement for the reference's DataParallel eval
    (``src/eval_segmentation.py:116``).
    """

    def step(params, img, label):
        linear_preds, cluster_preds = predictions(params, img, fcfg, ecfg)
        lin_stats = confusion_update(linear_preds, label, ecfg.n_classes, 0)
        clu_stats = confusion_update(cluster_preds, label, ecfg.n_classes,
                                     ecfg.extra_clusters)
        return lin_stats, clu_stats

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(step)

    # shard_map rather than sharded-jit: the step is per-sample math plus a
    # confusion-matrix sum, and the Pallas attention kernels (flash/fused
    # backbone paths) require manual mesh axes — the SPMD partitioner treats
    # them as opaque calls it would otherwise replicate behind an
    # all-gather. Each device evals its local batch (the CRF batch strategy
    # sees the LOCAL batch, so batch_shards stays 1 and no lax.map ever
    # spans the mesh) and the [K, C] confusion blocks psum over ICI.
    from jax.sharding import PartitionSpec as P

    def sharded_step(params, img, label):
        lin_stats, clu_stats = step(params, img, label)
        return (jax.lax.psum(lin_stats, "data"),
                jax.lax.psum(clu_stats, "data"))

    return jax.jit(jax.shard_map(
        sharded_step, mesh=mesh, in_specs=(P(), P("data"), P("data")),
        out_specs=(P(), P()), check_vma=False))


def make_predict_step(fcfg, ecfg: EvalConfig, mesh=None):
    """Jitted: (params, img) -> (linear_preds, cluster_preds) for demo output.

    With a multi-device ``mesh``, the batch shards under ``shard_map`` (same
    rationale as ``make_eval_step``: Pallas kernels need manual mesh axes)
    and the int32 prediction maps gather back along the batch axis."""

    def step(params, img):
        return predictions(params, img, fcfg, ecfg)

    if mesh is None or mesh.devices.size == 1:
        return jax.jit(step)

    from jax.sharding import PartitionSpec as P

    return jax.jit(jax.shard_map(
        step, mesh=mesh, in_specs=(P(), P("data")),
        out_specs=(P("data"), P("data")), check_vma=False))


def make_validation_step(fcfg, n_classes: int, extra_clusters: int = 0):
    """Training-time validation (no TTA/CRF — reference ``validation_step``
    ``src/train_segmentation.py:471-499``): plain forward, upsample, argmax."""

    @functools.partial(jax.jit, static_argnums=(3,))
    def step(params, img, label, label_res):
        out = featurizer_lib.dispatch_apply(params["net"], img, fcfg)
        code = resize_bilinear(out["code"], (label_res, label_res))
        linear_preds = jnp.argmax(probes.linear_probe_apply(params["linear_probe"], code), 1)
        _, cluster_probs = probes.cluster_lookup_apply(params["cluster_probe"], code, None)
        cluster_preds = jnp.argmax(cluster_probs, 1)
        lin_stats = confusion_update(linear_preds, label, n_classes, 0)
        clu_stats = confusion_update(cluster_preds, label, n_classes, extra_clusters)
        return lin_stats, clu_stats

    return step
