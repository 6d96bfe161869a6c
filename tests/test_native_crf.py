"""Native permutohedral CRF: build, run, and cross-check vs the on-device CRF."""

import importlib.util
import os

import numpy as np
import pytest

from depthg_tpu import native_crf

pytestmark = pytest.mark.skipif(not native_crf.available(),
                                reason="native CRF lib failed to build")

_spec = importlib.util.spec_from_file_location(
    "crf_fidelity_study",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "crf_fidelity_study.py"))
fidelity = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(fidelity)


def _scene(h=48, w=48, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((3, h, w), np.float32)
    img[0, :, : w // 2] = 210.0
    img[2, :, w // 2:] = 160.0
    img += rng.random((3, h, w)).astype(np.float32) * 10
    true = np.zeros((h, w), np.int64)
    true[:, w // 2:] = 1
    logits = np.where(true == 0, 1.5, -1.5)[None].repeat(2, 0).astype(np.float32)
    logits[1] = -logits[0]
    noise = rng.random((h, w)) < 0.2
    logits[:, noise] *= -1
    probs = np.exp(logits) / np.exp(logits).sum(0, keepdims=True)
    return img, probs, true, noise


def test_native_crf_denoises():
    img, probs, true, noise = _scene()
    q = native_crf.dense_crf_native(img, probs)
    np.testing.assert_allclose(q.sum(0), 1.0, atol=1e-3)
    assert (q.argmax(0) == true).mean() > 0.97
    assert (q.argmax(0) == true).mean() > (probs.argmax(0) == true).mean()


# thresholds measured on both cpu and tpu (identical since the bilateral
# log-kernel matmul was pinned to Precision.HIGHEST — the MXU's default
# bf16 passes silently destroyed the kernel on TPU; docs/CRF_FIDELITY.md).
# ds=1 computes the exact dense kernel the lattice approximates, so it
# nearly bit-matches; coarser bilateral resolutions trade agreement for
# O(ds^4) less work. Full-scale numbers at eval res: docs/CRF_FIDELITY.md.
@pytest.mark.parametrize("ds,mixed,min_agree", [
    (1, True, 0.99), (2, True, 0.92), (2, False, 0.92),
    (4, True, 0.89), (4, False, 0.89),
])
def test_device_crf_config_fidelity_vs_lattice(ds, mixed, min_agree):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops.crf import CRFConfig, dense_crf
    from depthg_tpu.ops.resize import resize_bilinear

    size, ncls = 64, 8
    agrees, mious_dev, mious_lat, mious_unary = [], [], [], []
    for seed in (0, 1):
        image, gt, logits = fidelity.make_scene(size, ncls, n_regions=20,
                                                seed=seed)
        probs = np.asarray(jax.nn.softmax(
            resize_bilinear(jnp.asarray(logits)[None], (size, size))[0],
            axis=0))
        lat = native_crf.dense_crf_native(image, probs.copy()).argmax(0)
        q = np.asarray(dense_crf(
            jnp.asarray(image), jnp.asarray(logits),
            CRFConfig(downsample=ds, mixed_resolution=mixed, block=512)))
        pred = q.argmax(0)
        agrees.append((pred == lat).mean())
        mious_dev.append(fidelity.miou_acc(pred, gt, ncls)[0])
        mious_lat.append(fidelity.miou_acc(lat, gt, ncls)[0])
        mious_unary.append(fidelity.miou_acc(probs.argmax(0), gt, ncls)[0])
    assert np.mean(agrees) > min_agree, (agrees, ds, mixed)
    # every config must actually refine (the quality axis eval measures)
    assert np.mean(mious_dev) > np.mean(mious_unary) + 3, (mious_dev,
                                                           mious_unary)


def test_native_agrees_with_device_crf():
    import jax.numpy as jnp

    from depthg_tpu.ops.crf import CRFConfig, dense_crf

    img, probs, true, _ = _scene(seed=1)
    logits = np.log(np.maximum(probs, 1e-20))
    q_dev = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits),
                                 CRFConfig(downsample=1, block=512)))
    q_nat = native_crf.dense_crf_native(img, probs)
    agree = (q_dev.argmax(0) == q_nat.argmax(0)).mean()
    # lattice is an approximation of the exact dense kernel the device path
    # computes — label agreement is the acceptance criterion (SURVEY.md §7.4)
    assert agree > 0.95
