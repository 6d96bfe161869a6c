"""Golden tests: resize/pool ops vs torch CPU reference semantics."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from depthg_tpu.ops import (
    resize_bilinear,
    resize_bicubic,
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
)

RNG = np.random.default_rng(0)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize("in_hw,out_hw", [((28, 28), (320, 320)), ((40, 40), (224, 224)),
                                          ((17, 23), (56, 56)), ((64, 64), (13, 9))])
def test_bilinear_matches_torch(align, in_hw, out_hw):
    x = _rand(2, 3, *in_hw)
    want = F.interpolate(torch.from_numpy(x), out_hw, mode="bilinear", align_corners=align).numpy()
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align_corners=align))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


def test_bicubic_matches_torch_size():
    x = _rand(1, 4, 28, 28)
    want = F.interpolate(torch.from_numpy(x), (40, 40), mode="bicubic", align_corners=False).numpy()
    got = np.asarray(resize_bicubic(jnp.asarray(x), (40, 40)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_bicubic_matches_torch_scale_factor():
    # the DINO pos-embed path: scale_factor=(w0/sqrt(N)) with w0 = w//ps + 0.1
    x = _rand(1, 8, 28, 28)
    sf = (40.1 / 28, 40.1 / 28)
    want = F.interpolate(torch.from_numpy(x), scale_factor=sf, mode="bicubic").numpy()
    oh, ow = want.shape[-2:]
    got = np.asarray(resize_bicubic(jnp.asarray(x), (oh, ow), scale=sf))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("in_hw,out_hw", [((224, 224), (28, 28)), ((320, 320), (40, 40)),
                                          ((37, 41), (11, 13))])
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    x = _rand(2, 1, *in_hw)
    want = F.adaptive_avg_pool2d(torch.from_numpy(x), out_hw).numpy()
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((224, 224), (28, 28)), ((37, 41), (11, 13))])
def test_adaptive_max_pool_matches_torch(in_hw, out_hw):
    x = _rand(2, 1, *in_hw)
    want = F.adaptive_max_pool2d(torch.from_numpy(x), out_hw).numpy()
    got = np.asarray(adaptive_max_pool2d(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
