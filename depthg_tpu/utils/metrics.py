"""Unsupervised segmentation metrics: Hungarian-matched mIoU / Accuracy.

Behavioral spec from the reference ``UnsupervisedMetrics``
(``src/utils.py:202-277``):

* confusion accumulation: flatten preds/targets, mask labels outside
  [0, n_classes), bincount of ``(n+extra)*actual + pred`` reshaped to
  [actual, pred] then transposed -> stats[pred_cluster, actual_class].
  Reference quirk preserved: the mask also drops ``preds >= n_classes``
  (``src/utils.py:226``), so predictions landing in *extra* clusters never
  enter the confusion matrix — the extra rows of stats stay zero and the
  extra-cluster fold in compute() only re-indexes;
* compute: Hungarian assignment (scipy, maximize) of clusters to classes; with
  extra clusters, a second transposed assignment selects one cluster per class
  and the unassigned clusters are folded into an appended row;
* mIoU = mean over non-NaN per-class IoU, Accuracy = trace/total, both x100.

TPU-first split: ``confusion_update`` is a pure jittable device op (stats are
summed with ``jax.lax.psum`` across a mesh by the sharded eval step — the
collective replacement for torchmetrics' ``dist_reduce_fx="sum"``); the
Hungarian solve is a tiny (<=30x30) host-side scipy call once per evaluation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment



def _fetch(x) -> np.ndarray:
    """Device->host fetch of a confusion block.

    ``jax.device_get``, NOT ``np.asarray``: on the tunneled runtime the
    numpy buffer-protocol path on small 2-D device arrays degenerates to
    per-row round-trips (measured 27-91 s across runs for ONE [27, 27] int32 vs 0.02 s via
    device_get — it silently made metric accumulation the eval wall-clock).
    """
    import jax

    if isinstance(x, np.ndarray):
        return x
    return jax.device_get(x)

def confusion_update(preds: jnp.ndarray, target: jnp.ndarray,
                     n_classes: int, extra_clusters: int = 0) -> jnp.ndarray:
    """Device-side confusion-matrix increment: [n_classes+extra, n_classes].

    Formulated as a one-hot dot_general on the MXU instead of the reference's
    bincount scatter (``src/utils.py:222-232``): scatter-adds serialize on the
    VPU (~14 ms for a 16x320x320 batch measured on v5e) while the [N, K]x[N, C]
    matmul takes ~0.4 ms. f32 accumulation is exact for per-call counts
    < 2^24; cross-batch accumulation happens in int32 on the caller's side.
    """
    import jax

    k = n_classes + extra_clusters
    actual = target.reshape(-1)
    pred = preds.reshape(-1)
    mask = (actual >= 0) & (actual < n_classes) & (pred >= 0) & (pred < n_classes)
    pred_oh = ((pred[:, None] == jnp.arange(k)[None]) & mask[:, None]).astype(jnp.bfloat16)
    act_oh = ((actual[:, None] == jnp.arange(n_classes)[None]) & mask[:, None]).astype(jnp.bfloat16)
    stats = jax.lax.dot_general(pred_oh, act_oh, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return stats.astype(jnp.int32)


def hungarian_assignments(stats: np.ndarray, n_classes: int, extra_clusters: int):
    """(row_ind, col_ind) cluster->class assignment, reference semantics."""
    return linear_sum_assignment(stats, maximize=True)


def map_clusters(assignments, n_classes: int, extra_clusters: int, clusters: np.ndarray) -> np.ndarray:
    """Map raw cluster predictions to matched class ids (-1 for unassigned)."""
    if extra_clusters == 0:
        return np.asarray(assignments[1])[clusters]
    missing = sorted(set(range(n_classes + extra_clusters)) - set(assignments[0]))
    cluster_to_class = np.asarray(assignments[1])
    for m in missing:
        if m == cluster_to_class.shape[0]:
            cluster_to_class = np.append(cluster_to_class, -1)
        else:
            cluster_to_class = np.insert(cluster_to_class, m + 1, -1)
    return cluster_to_class[clusters]


def compute_metrics(stats: np.ndarray, n_classes: int, extra_clusters: int,
                    compute_hungarian: bool, prefix: str = ""):
    """Host-side metric computation. Returns (metrics dict, assignments)."""
    stats = np.asarray(stats)
    if compute_hungarian:
        assignments = linear_sum_assignment(stats, maximize=True)
        if extra_clusters == 0:
            histogram = stats[np.argsort(assignments[1]), :]
        else:
            assignments_t = linear_sum_assignment(stats.T, maximize=True)
            histogram = stats[assignments_t[1], :]
            missing = list(set(range(n_classes + extra_clusters)) - set(assignments[0]))
            new_row = stats[missing, :].sum(0, keepdims=True)
            histogram = np.concatenate([histogram, new_row], axis=0)
            new_col = np.zeros((n_classes + 1, 1), histogram.dtype)
            histogram = np.concatenate([histogram, new_col], axis=1)
    else:
        assignments = (np.arange(n_classes), np.arange(n_classes))
        histogram = stats

    tp = np.diag(histogram).astype(np.float64)
    fp = histogram.sum(0) - tp
    fn = histogram.sum(1) - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = tp / (tp + fp + fn)
    acc = tp.sum() / histogram.sum() if histogram.sum() > 0 else float("nan")
    metrics = {
        prefix + "mIoU": 100.0 * float(np.nanmean(iou)) if not np.isnan(iou).all() else float("nan"),
        prefix + "Accuracy": 100.0 * float(acc),
    }
    return metrics, assignments


class SegMetrics:
    """Stateful accumulator mirroring the reference metric object's lifecycle."""

    def __init__(self, prefix: str, n_classes: int, extra_clusters: int,
                 compute_hungarian: bool):
        self.prefix = prefix
        self.n_classes = n_classes
        self.extra_clusters = extra_clusters
        self.compute_hungarian = compute_hungarian
        self.reset()

    def reset(self):
        self.stats = np.zeros((self.n_classes + self.extra_clusters, self.n_classes), np.int64)
        self.assignments = None

    def update(self, preds, target):
        self.stats += _fetch(
            confusion_update(jnp.asarray(preds), jnp.asarray(target),
                             self.n_classes, self.extra_clusters))

    def add_stats(self, stats):
        """Add a precomputed (already psum-reduced) confusion block."""
        self.stats += _fetch(stats)

    def compute(self):
        metrics, self.assignments = compute_metrics(
            self.stats, self.n_classes, self.extra_clusters,
            self.compute_hungarian, self.prefix)
        return metrics

    def map_clusters(self, clusters):
        if self.assignments is None:
            self.compute()
        return map_clusters(self.assignments, self.n_classes, self.extra_clusters,
                            np.asarray(clusters))

    # "cherry" variants (reference ``src/utils.py:279-323``): a second stats
    # buffer that is reset after every compute — used for per-image selection.
    def update_cherry(self, preds, target):
        if not hasattr(self, "cherry_stats"):
            self.cherry_stats = np.zeros_like(self.stats)
        self.cherry_stats += _fetch(
            confusion_update(jnp.asarray(preds), jnp.asarray(target),
                             self.n_classes, self.extra_clusters))

    def compute_cherry(self):
        metrics, _ = compute_metrics(
            getattr(self, "cherry_stats", np.zeros_like(self.stats)),
            self.n_classes, self.extra_clusters, self.compute_hungarian, self.prefix)
        self.cherry_stats = np.zeros_like(self.stats)
        return metrics


def confusion_heatmap_png(histogram: np.ndarray, path: str, cmap=None,
                          cell: int = 12):
    """Save a column-normalized confusion-matrix heatmap as a PNG
    (reference ``plot_cm``, ``src/eval_segmentation.py:19-42``, without the
    matplotlib/seaborn dependency)."""
    from PIL import Image

    hist = np.asarray(histogram, np.float64)
    hist = hist / np.clip(hist.sum(axis=0, keepdims=True), 1, None)
    # "Blues"-like ramp: white -> blue
    v = hist.T  # rows = true labels, like the reference figure
    rgb = np.stack([1 - 0.75 * v, 1 - 0.45 * v, np.ones_like(v)], axis=-1)
    img = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)
    img = np.kron(img, np.ones((cell, cell, 1), np.uint8))
    Image.fromarray(img).save(path)
    return path
