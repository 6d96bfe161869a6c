"""Opt-in int8 (w8a8) frozen-backbone path: math, plumbing, fidelity bounds.

The int8 path is an approximation like bf16 — these tests pin its contract
(exact-zero padded rows, f32 return dtype, structural quantization) and
characterize its deviation against the f32 forward on synthetic weights so
regressions in the quant math show up as fidelity drops, not silent drift.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from depthg_tpu.models.layers import (_linear_w8a8, linear,
                                      quantize_linear_params,
                                      torch_linear_init)
from depthg_tpu.models import vit as vit_lib
from depthg_tpu.models.featurizer import (FeaturizerConfig, backbone_features,
                                          featurizer_init)


def test_w8a8_linear_close_to_f32():
    key = jax.random.PRNGKey(0)
    p = torch_linear_init(key, 64, 96)
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 17, 64))
    ref = np.asarray(linear(p, x))
    out = np.asarray(linear(quantize_linear_params(p), x))
    # two symmetric 8-bit grids: worst-case relative error ~1/127 each
    denom = np.abs(ref).mean()
    assert np.abs(out - ref).mean() / denom < 0.03
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999


def test_w8a8_zero_rows_stay_zero():
    p = quantize_linear_params(torch_linear_init(jax.random.PRNGKey(2), 32, 32))
    p["b"] = jnp.zeros_like(p["b"])
    x = jnp.zeros((3, 4, 32), jnp.bfloat16)
    assert np.all(np.asarray(_linear_w8a8(p, x)) == 0.0)


def test_quantize_vit_params_structure():
    cfg = vit_lib.ViTConfig(embed_dim=64, depth=2, num_heads=2)
    q = vit_lib.quantize_vit_params(vit_lib.vit_init(jax.random.PRNGKey(0), cfg))
    for blk in q["blocks"]:
        for name in ("qkv", "proj", "fc1", "fc2"):
            assert blk[name]["w_q"].dtype == jnp.int8
            assert blk[name]["s_w"].shape == (blk[name]["w_q"].shape[1],)
        assert blk["norm1"]["g"].dtype == jnp.bfloat16
    assert q["patch_embed"]["w"].dtype == jnp.bfloat16
    assert q["pos_embed"].dtype == jnp.bfloat16


def test_backbone_features_int8_fidelity_and_dtype():
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
    params = featurizer_init(jax.random.PRNGKey(0), fcfg)
    img = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 64, 64))
    ref, _ = backbone_features(params, img, fcfg)
    out, _ = backbone_features(params, img, fcfg, backbone_dtype="int8")
    assert out.dtype == jnp.float32
    r, o = np.asarray(ref).ravel(), np.asarray(out).ravel()
    cos = float(np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o)))
    assert cos > 0.99, f"int8 features diverged: cosine {cos:.4f}"


def test_int8_backbone_with_fused_attention(monkeypatch):
    """The decision-matrix combination: w8a8 linears feeding the whole-KV
    fused attention kernel (interpret mode). The quantized qkv projection
    emits bf16 [B, N, 3D]; the packed kernel must accept it unchanged."""
    import dataclasses

    from jax.experimental import pallas as pl
    import depthg_tpu.ops.attention as att

    orig = pl.pallas_call
    monkeypatch.setattr(att.pl, "pallas_call",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    fcfg = dataclasses.replace(
        FeaturizerConfig(arch="vit_small", patch_size=8, dim=70),
        attention_impl="fused")
    params = featurizer_init(jax.random.PRNGKey(0), fcfg)
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 64, 64))
    ref, _ = backbone_features(params, img, fcfg)
    out, _ = backbone_features(params, img, fcfg, backbone_dtype="int8")
    assert out.dtype == jnp.float32
    r, o = np.asarray(ref).ravel(), np.asarray(out).ravel()
    cos = float(np.dot(r, o) / (np.linalg.norm(r) * np.linalg.norm(o)))
    assert cos > 0.99, f"int8+fused features diverged: cosine {cos:.4f}"


def test_backbone_features_rejects_unknown_dtype():
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
    params = featurizer_init(jax.random.PRNGKey(0), fcfg)
    img = jnp.zeros((1, 3, 16, 16))
    with pytest.raises(ValueError, match="backbone_dtype"):
        backbone_features(params, img, fcfg, backbone_dtype="fp8")


def test_train_step_runs_with_int8_backbone():
    from depthg_tpu.train import losses as loss_lib
    from depthg_tpu.train import step as step_lib

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16)
    hp = step_lib.TrainHParams(n_classes=5, backbone_dtype="int8")
    lcfg = loss_lib.CorrLossConfig(feature_samples=4, neg_samples=2)
    state = step_lib.init_state(jax.random.PRNGKey(0), fcfg, hp)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32),
        "img_pos": jnp.asarray(rng.standard_normal((2, 3, 32, 32)), jnp.float32),
        "label": jnp.asarray(rng.integers(-1, 5, size=(2, 32, 32))),
        "depth": jnp.asarray(rng.random((2, 1, 32, 32)), jnp.float32),
        "depth_pos": jnp.asarray(rng.random((2, 1, 32, 32)), jnp.float32),
    }
    step = jax.jit(lambda s, b, k: step_lib.train_step(
        s, b, k, fcfg, hp, lcfg, 0.19, 0.03))
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["loss/total"]))
