"""Metrics: confusion accumulation + Hungarian mIoU on hand-checked cases."""

import numpy as np
import pytest

from depthg_tpu.utils.metrics import SegMetrics, confusion_update, compute_metrics


def test_perfect_predictions_permuted_clusters():
    # clusters are a permutation of classes; Hungarian must recover 100%
    target = np.array([[0, 1, 2, 0, 1, 2]])
    perm = {0: 2, 1: 0, 2: 1}
    preds = np.vectorize(perm.get)(target)
    m = SegMetrics("t/", 3, 0, compute_hungarian=True)
    m.update(preds, target)
    out = m.compute()
    assert out["t/mIoU"] == pytest.approx(100.0)
    assert out["t/Accuracy"] == pytest.approx(100.0)
    # cluster mapping maps each cluster back to its class
    assert (m.map_clusters(preds) == target).all()


def test_hand_checked_confusion():
    # 2 classes; preds: class0 correct 3, wrong 1; class1 correct 2, wrong 2
    target = np.array([0, 0, 0, 0, 1, 1, 1, 1])
    preds_ = np.array([0, 0, 0, 1, 1, 1, 0, 0])
    m = SegMetrics("", 2, 0, compute_hungarian=False)
    m.update(preds_, target)
    # iou0 = 3/(3+2+1)=0.5, iou1 = 2/(2+1+2)=0.4; acc = 5/8
    out = m.compute()
    assert out["mIoU"] == pytest.approx(100 * 0.45)
    assert out["Accuracy"] == pytest.approx(100 * 5 / 8)


def test_ignore_labels_masked():
    target = np.array([-1, 0, 1, 255])
    preds_ = np.array([0, 0, 1, 1])
    stats = np.asarray(confusion_update(preds_, target, 2, 0))
    assert stats.sum() == 2  # only the two valid pixels counted
    assert stats[0, 0] == 1 and stats[1, 1] == 1


def test_extra_clusters_fold():
    # 2 classes + 1 extra cluster. Reference quirk: predictions landing in the
    # extra cluster (id >= n_classes) are masked out of the confusion matrix
    # entirely (src/utils.py:226), so only in-range predictions count.
    target = np.array([0] * 6 + [1] * 4)
    preds_ = np.array([0, 0, 0, 2, 2, 2, 1, 1, 1, 1])
    m = SegMetrics("", 2, 1, compute_hungarian=True)
    m.update(preds_, target)
    assert m.stats[2].sum() == 0  # extra-cluster row never populated
    assert m.stats.sum() == 7
    out = m.compute()
    assert out["Accuracy"] == pytest.approx(100.0)  # all *counted* pixels correct
    mapped = m.map_clusters(preds_)
    assert set(np.unique(mapped)) <= {-1, 0, 1}


def test_accumulation_matches_single_pass():
    rng = np.random.default_rng(0)
    t = rng.integers(-1, 5, size=(4, 32, 32))
    p = rng.integers(0, 5, size=(4, 32, 32))
    m1 = SegMetrics("", 5, 0, True)
    m1.update(p, t)
    m2 = SegMetrics("", 5, 0, True)
    for i in range(4):
        m2.update(p[i], t[i])
    np.testing.assert_array_equal(m1.stats, m2.stats)
    assert m1.compute() == m2.compute()
