"""Native permutohedral CRF: build, run, and cross-check vs the on-device CRF."""

import numpy as np
import pytest

from depthg_tpu import native_crf

pytestmark = pytest.mark.skipif(not native_crf.available(),
                                reason="native CRF lib failed to build")


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
