"""Cross-library golden: our BEiT encoder vs HuggingFace transformers' BEiT.

The reference consumes BEiT-L through torch.hub (MiDaS DPT_BEiT_L_384,
``src/zoedepth/models/base_models/midas.py:333-340``), which is not
importable offline — transformers' independent implementation of the same
architecture (per-block relative position bias, LayerScale, decomposed q/v
bias, no absolute position embeddings) serves as the golden instead. This
pins the full block semantics — including the rel-pos-bias table indexing —
for both the einsum path and the fused whole-KV kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.zoedepth.beit import BEiTConfig, beit_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

D, HEADS, LAYERS, PS, IMG = 64, 2, 2, 16, 64


@pytest.fixture(scope="module")
def golden():
    cfg = transformers.BeitConfig(
        hidden_size=D, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=2 * D, image_size=IMG, patch_size=PS,
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        layer_norm_eps=1e-6, layer_scale_init_value=1e-5,
        use_absolute_position_embeddings=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = transformers.BeitModel(cfg, add_pooling_layer=False).eval()
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        out = model(x, output_hidden_states=True)
    # hidden_states[0] = embeddings, [i+1] = block i output (pre final LN)
    taps = [h.numpy() for h in out.hidden_states[1:]]
    return model.state_dict(), np.asarray(x), taps


def _to_params(sd):
    g = lambda k: jnp.asarray(sd[k].numpy())
    params = {
        "patch_embed": {
            "w": g("embeddings.patch_embeddings.projection.weight")
                 .reshape(D, -1).T,
            "b": g("embeddings.patch_embeddings.projection.bias")},
        "cls_token": g("embeddings.cls_token"),
        "blocks": [],
    }
    for i in range(LAYERS):
        p = f"encoder.layer.{i}."
        a = p + "attention.attention."
        qkv_w = jnp.concatenate([g(a + "query.weight").T,
                                 g(a + "key.weight").T,
                                 g(a + "value.weight").T], axis=1)
        params["blocks"].append({
            "norm1": {"g": g(p + "layernorm_before.weight"),
                      "b": g(p + "layernorm_before.bias")},
            "norm2": {"g": g(p + "layernorm_after.weight"),
                      "b": g(p + "layernorm_after.bias")},
            "qkv_w": qkv_w,
            "q_bias": g(a + "query.bias"),
            "v_bias": g(a + "value.bias"),
            "proj": {"w": g(p + "attention.output.dense.weight").T,
                     "b": g(p + "attention.output.dense.bias")},
            "fc1": {"w": g(p + "intermediate.dense.weight").T,
                    "b": g(p + "intermediate.dense.bias")},
            "fc2": {"w": g(p + "output.dense.weight").T,
                    "b": g(p + "output.dense.bias")},
            "gamma_1": g(p + "lambda_1"),
            "gamma_2": g(p + "lambda_2"),
            "rel_pos_table":
                g(a + "relative_position_bias.relative_position_bias_table"),
        })
    return params


def _cfg(attn_impl="xla"):
    return BEiTConfig(patch_size=PS, embed_dim=D, depth=LAYERS,
                      num_heads=HEADS, mlp_ratio=2.0,
                      pretrain_window=IMG // PS, hooks=tuple(range(LAYERS)),
                      attn_impl=attn_impl)


def test_beit_matches_transformers(golden):
    sd, x, want_taps = golden
    got_taps, grid = beit_forward(_to_params(sd), jnp.asarray(x), _cfg())
    assert grid == (IMG // PS, IMG // PS)
    for got, want in zip(got_taps, want_taps):
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)


def test_beit_fused_matches_transformers(golden, monkeypatch):
    """Same golden through the whole-KV kernel (rel-pos bias added in VMEM;
    17 tokens stack-padded to 128; split-operand path since hd=32)."""
    import depthg_tpu.ops.attention as attn

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    sd, x, want_taps = golden
    got_taps, _ = beit_forward(_to_params(sd), jnp.asarray(x), _cfg("fused"))
    for got, want in zip(got_taps, want_taps):
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-5, atol=2e-5)
