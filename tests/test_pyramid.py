"""FeaturePyramidNet + ResNet-50 backbone: shapes, converter, granularities."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.pyramid import (
    PyramidConfig,
    pyramid_apply,
    pyramid_init,
    resnet50_activations,
    resnet50_from_torch,
    resnet50_init,
)

RNG = np.random.default_rng(3)


def test_resnet50_activation_scales():
    params = resnet50_init(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    acts = resnet50_activations(params, x, (4, 5, 6, 7))
    assert acts[4].shape == (1, 256, 16, 16)
    assert acts[5].shape == (1, 512, 8, 8)
    assert acts[6].shape == (1, 1024, 4, 4)
    assert acts[7].shape == (1, 2048, 2, 2)


def test_resnet50_matches_torchvision_layout():
    """Converter accepts a torchvision-style state dict and forward matches
    torch BN inference semantics on a tiny crafted case."""
    torch = pytest.importorskip("torch")
    # craft a state dict with our own init pushed through torch tensors
    params = jax.device_get(resnet50_init(jax.random.PRNGKey(1)))
    sd = {"conv1.weight": torch.from_numpy(np.asarray(params["conv1"]["w"]))}
    for stat, name in (("g", "weight"), ("b", "bias"), ("mean", "running_mean"),
                       ("var", "running_var")):
        sd[f"bn1.{name}"] = torch.from_numpy(np.asarray(params["bn1"][stat]))
    for li, layer in enumerate(params["layers"], start=1):
        for bi, blk in enumerate(layer):
            p = f"layer{li}.{bi}"
            for ci in (1, 2, 3):
                sd[f"{p}.conv{ci}.weight"] = torch.from_numpy(np.asarray(blk[f"conv{ci}"]["w"]))
                for stat, name in (("g", "weight"), ("b", "bias"),
                                   ("mean", "running_mean"), ("var", "running_var")):
                    sd[f"{p}.bn{ci}.{name}"] = torch.from_numpy(np.asarray(blk[f"bn{ci}"][stat]))
            if "down" in blk:
                sd[f"{p}.downsample.0.weight"] = torch.from_numpy(np.asarray(blk["down"]["conv"]["w"]))
                for stat, name in (("g", "weight"), ("b", "bias"),
                                   ("mean", "running_mean"), ("var", "running_var")):
                    sd[f"{p}.downsample.1.{name}"] = torch.from_numpy(
                        np.asarray(blk["down"]["bn"][stat]))
    restored = resnet50_from_torch(sd)
    x = jnp.asarray(RNG.standard_normal((1, 3, 32, 32)).astype(np.float32))
    a = resnet50_activations(jax.device_put(params), x, (7,))[7]
    b = resnet50_activations(jax.device_put(restored), x, (7,))[7]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.parametrize("granularity", [1, 2, 3, 4])
def test_pyramid_granularities(granularity):
    cfg = PyramidConfig(granularity=granularity, dim=8, out_size=16)
    backbone = resnet50_init(jax.random.PRNGKey(0))
    params = pyramid_init(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(RNG.standard_normal((1, 3, 64, 64)).astype(np.float32))
    low, clusters = pyramid_apply(params, backbone, x, cfg)
    assert low.shape == (1, 2048, 2, 2)
    assert clusters.shape == (1, 8, 16, 16)
    assert bool(jnp.isfinite(clusters).all())


def test_full_decoder_and_resize_classify():
    from depthg_tpu.models.probes import (
        full_decoder_apply,
        full_decoder_init,
        linear_probe_init,
        resize_and_classify,
    )

    x = jnp.asarray(RNG.standard_normal((2, 8, 4, 4)).astype(np.float32))
    dec = full_decoder_init(jax.random.PRNGKey(0), 8, 16)
    out = full_decoder_apply(dec, x)
    assert out.shape == (2, 16, 4, 4)
    lp = linear_probe_init(jax.random.PRNGKey(1), 8, 5)
    logits = resize_and_classify(lp, x, 16)
    assert logits.shape == (2, 5, 16, 16)
    # normalization holds exactly only pre-upsample (the reference also
    # interpolates log-probs); spot-check an aligned corner pixel
    np.testing.assert_allclose(float(jnp.exp(logits[0, :, 0, 0]).sum()), 1.0, atol=1e-4)


@pytest.mark.slow
def test_pyramid_featurizer_bfloat16_backbone():
    """backbone_dtype must reach the frozen ResNet (regression: dispatch_apply
    silently dropped it) — outputs stay f32 and close to the f32 forward."""
    import jax
    import jax.numpy as jnp

    from depthg_tpu.models.pyramid import (
        PyramidConfig, pyramid_featurizer_apply, pyramid_featurizer_init)

    cfg = PyramidConfig(granularity=1, dim=8)
    params = pyramid_featurizer_init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 3, 64, 64)).astype(np.float32))
    out32 = pyramid_featurizer_apply(params, img, cfg)
    out16 = pyramid_featurizer_apply(params, img, cfg, backbone_dtype="bfloat16")
    assert out16["code"].dtype == jnp.float32
    assert out16["feats"].dtype == jnp.float32
    # bf16 backbone deviates slightly but must stay correlated
    a = np.asarray(out32["code"]).ravel()
    b = np.asarray(out16["code"]).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr
