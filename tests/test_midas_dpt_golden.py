"""Cross-library golden: our MiDaS DPT path vs transformers' DPT.

The reference consumes DPT_Large through torch.hub
(``generate_depth.py:97-113``), not importable offline; HuggingFace
transformers' independent DPT implementation (same Intel DPT family:
readout-project reassembly, RefineNet fusion with align_corners=True,
monodepth head) serves as the golden. A single predicted-depth comparison
transitively pins the ViT backbone, reassembly, fusion, and head."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.midas_dpt import MidasDPTConfig, midas_dpt_forward

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

D, HEADS, LAYERS, PS, IMG, F = 64, 2, 4, 16, 64, 32
NECK = (16, 32, 64, 64)

CFG = MidasDPTConfig(patch_size=PS, embed_dim=D, depth=LAYERS,
                     num_heads=HEADS, hooks=(0, 1, 2, 3), img_size=IMG,
                     features=F, reassemble_channels=NECK)


@pytest.fixture(scope="module")
def golden():
    tcfg = transformers.DPTConfig(
        hidden_size=D, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=4 * D, image_size=IMG, patch_size=PS,
        backbone_out_indices=list(range(LAYERS)),
        neck_hidden_sizes=list(NECK), fusion_hidden_size=F,
        readout_type="project", reassemble_factors=[4, 2, 1, 0.5],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        layer_norm_eps=1e-6)
    torch.manual_seed(1)
    model = transformers.DPTForDepthEstimation(tcfg).eval()
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        depth = model(x).predicted_depth.numpy()
    return model.state_dict(), np.asarray(x), depth


def _to_params(sd):
    g = lambda k: jnp.asarray(sd[k].numpy())
    vit = {
        "patch_embed": {
            "w": g("dpt.embeddings.patch_embeddings.projection.weight")
                 .reshape(D, -1).T,
            "b": g("dpt.embeddings.patch_embeddings.projection.bias")},
        "cls_token": g("dpt.embeddings.cls_token"),
        "pos_embed": g("dpt.embeddings.position_embeddings"),
        "blocks": [],
    }
    for i in range(LAYERS):
        p = f"dpt.encoder.layer.{i}."
        a = p + "attention.attention."
        vit["blocks"].append({
            "norm1": {"g": g(p + "layernorm_before.weight"),
                      "b": g(p + "layernorm_before.bias")},
            "norm2": {"g": g(p + "layernorm_after.weight"),
                      "b": g(p + "layernorm_after.bias")},
            "qkv": {"w": jnp.concatenate([g(a + "query.weight").T,
                                          g(a + "key.weight").T,
                                          g(a + "value.weight").T], axis=1),
                    "b": jnp.concatenate([g(a + "query.bias"),
                                          g(a + "key.bias"),
                                          g(a + "value.bias")])},
            "proj": {"w": g(p + "attention.output.dense.weight").T,
                     "b": g(p + "attention.output.dense.bias")},
            "fc1": {"w": g(p + "intermediate.dense.weight").T,
                    "b": g(p + "intermediate.dense.bias")},
            "fc2": {"w": g(p + "output.dense.weight").T,
                    "b": g(p + "output.dense.bias")},
        })
    dpt = {"readout": [], "reassemble": [], "rn": [], "fusion": []}
    for i in range(4):
        r = f"neck.reassemble_stage.layers.{i}."
        dpt["readout"].append(
            {"w": g(f"neck.reassemble_stage.readout_projects.{i}.0.weight").T,
             "b": g(f"neck.reassemble_stage.readout_projects.{i}.0.bias")})
        entry = {"project": {"w": g(r + "projection.weight"),
                             "b": g(r + "projection.bias")}}
        if i in (0, 1):  # ConvTranspose upsamplers keep torch [in,out,k,k]
            entry["resample"] = {"w": g(r + "resize.weight"),
                                 "b": g(r + "resize.bias")}
        elif i == 3:  # stride-2 conv downsampler
            entry["resample"] = {"w": g(r + "resize.weight"),
                                 "b": g(r + "resize.bias")}
        dpt["reassemble"].append(entry)
        dpt["rn"].append({"w": g(f"neck.convs.{i}.weight")})
        f = f"neck.fusion_stage.layers.{i}."
        dpt["fusion"].append({
            "rcu1": {"conv1": {"w": g(f + "residual_layer1.convolution1.weight"),
                               "b": g(f + "residual_layer1.convolution1.bias")},
                     "conv2": {"w": g(f + "residual_layer1.convolution2.weight"),
                               "b": g(f + "residual_layer1.convolution2.bias")}},
            "rcu2": {"conv1": {"w": g(f + "residual_layer2.convolution1.weight"),
                               "b": g(f + "residual_layer2.convolution1.bias")},
                     "conv2": {"w": g(f + "residual_layer2.convolution2.weight"),
                               "b": g(f + "residual_layer2.convolution2.bias")}},
            "out": {"w": g(f + "projection.weight"),
                    "b": g(f + "projection.bias")},
        })
    dpt["head"] = {
        "conv1": {"w": g("head.head.0.weight"), "b": g("head.head.0.bias")},
        "conv2": {"w": g("head.head.2.weight"), "b": g("head.head.2.bias")},
        "conv3": {"w": g("head.head.4.weight"), "b": g("head.head.4.bias")},
    }
    return {"vit": vit, "dpt": dpt}


def test_midas_dpt_matches_transformers(golden):
    sd, x, want = golden
    got, hooks = midas_dpt_forward(_to_params(sd), jnp.asarray(x), CFG,
                                   attn_impl="xla")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
    assert hooks["out_conv"].shape == (2, 32, IMG, IMG)


def test_midas_dpt_fused_matches_transformers(golden, monkeypatch):
    import depthg_tpu.ops.attention as attn

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    sd, x, want = golden
    got, _ = midas_dpt_forward(_to_params(sd), jnp.asarray(x), CFG,
                               attn_impl="fused")
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)
