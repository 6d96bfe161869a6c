"""Cross-library golden: our FULL ZoeDepth forward vs transformers' ZoeDepth.

The reference vendors isl-org ZoeDepth (``src/zoedepth/``) whose pretrained
weights can't be downloaded here; transformers' independent port of the same
architecture serves as the golden. One predicted-depth comparison
transitively pins the BEiT backbone (per-block rel-pos bias), the DPT neck,
the relative-depth head, and the whole metric-bins stack — seed softplus
bins, the 4 inverse-attractor stages (including the torchscript
alpha=300 quirk both ports preserve), and the conditional log-binomial."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.zoedepth import ZoeConfig, zoedepth_forward
from depthg_tpu.models.zoedepth.beit import BEiTConfig
from depthg_tpu.models.zoedepth.dpt import DPTConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

D, HEADS, LAYERS, PS, IMG, F = 64, 2, 4, 16, 64, 32
NECK = (16, 32, 64, 64)
N_BINS, BIN_EMB = 8, 16
ATTRACTORS = (4, 3, 2, 1)

CFG = ZoeConfig(
    n_bins=N_BINS, bin_embedding_dim=BIN_EMB, n_attractors=ATTRACTORS,
    img_size=(IMG, IMG),
    beit=BEiTConfig(embed_dim=D, depth=LAYERS, num_heads=HEADS,
                    pretrain_window=IMG // PS, hooks=(0, 1, 2, 3)),
    dpt=DPTConfig(embed_dim=D, features=F, reassemble_channels=NECK),
    n_midas_out=32)


@pytest.fixture(scope="module")
def golden():
    bc = transformers.BeitConfig(
        hidden_size=D, num_hidden_layers=LAYERS, num_attention_heads=HEADS,
        intermediate_size=4 * D, image_size=IMG, patch_size=PS,
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        layer_norm_eps=1e-6, layer_scale_init_value=1e-5,
        use_absolute_position_embeddings=False,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        out_features=["stage1", "stage2", "stage3", "stage4"],
        reshape_hidden_states=False)
    cfg = transformers.ZoeDepthConfig(
        backbone_config=bc, neck_hidden_sizes=list(NECK),
        fusion_hidden_size=F, bottleneck_features=F,
        num_relative_features=32,
        num_attractors=list(ATTRACTORS), bin_embedding_dim=BIN_EMB,
        bin_configurations=[{"n_bins": N_BINS, "min_depth": 1e-3,
                             "max_depth": 10.0}],
        bin_centers_type="softplus")
    torch.manual_seed(2)
    model = transformers.ZoeDepthForDepthEstimation(cfg).eval()
    x = torch.randn(2, 3, IMG, IMG)
    with torch.no_grad():
        depth = model(x).predicted_depth.numpy()
    return model.state_dict(), np.asarray(x), depth


def _mlp2(g, prefix):
    return [{"w": g(prefix + "conv1.weight"), "b": g(prefix + "conv1.bias")},
            {"w": g(prefix + "conv2.weight"), "b": g(prefix + "conv2.bias")}]


def _to_params(sd):
    g = lambda k: jnp.asarray(sd[k].numpy())
    beit = {
        "patch_embed": {
            "w": g("backbone.embeddings.patch_embeddings.projection.weight")
                 .reshape(D, -1).T,
            "b": g("backbone.embeddings.patch_embeddings.projection.bias")},
        "cls_token": g("backbone.embeddings.cls_token"),
        "blocks": [],
    }
    for i in range(LAYERS):
        p = f"backbone.encoder.layer.{i}."
        a = p + "attention.attention."
        beit["blocks"].append({
            "norm1": {"g": g(p + "layernorm_before.weight"),
                      "b": g(p + "layernorm_before.bias")},
            "norm2": {"g": g(p + "layernorm_after.weight"),
                      "b": g(p + "layernorm_after.bias")},
            "qkv_w": jnp.concatenate([g(a + "query.weight").T,
                                      g(a + "key.weight").T,
                                      g(a + "value.weight").T], axis=1),
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
    dpt = {"readout": [], "reassemble": [], "rn": [], "fusion": []}
    for i in range(4):
        r = f"neck.reassemble_stage.layers.{i}."
        dpt["readout"].append(
            {"w": g(f"neck.reassemble_stage.readout_projects.{i}.0.weight").T,
             "b": g(f"neck.reassemble_stage.readout_projects.{i}.0.bias")})
        entry = {"project": {"w": g(r + "projection.weight"),
                             "b": g(r + "projection.bias")}}
        if i != 2:
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
        "conv1": {"w": g("relative_head.conv1.weight"),
                  "b": g("relative_head.conv1.bias")},
        "conv2": {"w": g("relative_head.conv2.weight"),
                  "b": g("relative_head.conv2.bias")},
        "conv3": {"w": g("relative_head.conv3.weight"),
                  "b": g("relative_head.conv3.bias")},
    }
    mh = "metric_head."
    params = {
        "beit": beit, "dpt": dpt,
        "conv2": {"w": g(mh + "conv2.weight"), "b": g(mh + "conv2.bias")},
        "seed_bin_regressor": _mlp2(g, mh + "seed_bin_regressor."),
        "seed_projector": _mlp2(g, mh + "seed_projector."),
        "projectors": [_mlp2(g, mh + f"projectors.{i}.") for i in range(4)],
        "attractors": [_mlp2(g, mh + f"attractors.{i}.") for i in range(4)],
        "conditional_log_binomial": [
            {"w": g(mh + "conditional_log_binomial.mlp.0.weight"),
             "b": g(mh + "conditional_log_binomial.mlp.0.bias")},
            {"w": g(mh + "conditional_log_binomial.mlp.2.weight"),
             "b": g(mh + "conditional_log_binomial.mlp.2.bias")},
        ],
    }
    return params


def test_zoedepth_matches_transformers(golden):
    sd, x, want = golden
    out = zoedepth_forward(_to_params(sd), jnp.asarray(x), CFG)
    got = np.asarray(out["metric_depth"])[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_zoedepth_fused_matches_transformers(golden, monkeypatch):
    """Same golden through the fused whole-KV BEiT path (bias in VMEM)."""
    import dataclasses

    import depthg_tpu.ops.attention as attn

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    sd, x, want = golden
    cfg = dataclasses.replace(
        CFG, beit=dataclasses.replace(CFG.beit, attn_impl="fused"))
    out = zoedepth_forward(_to_params(sd), jnp.asarray(x), cfg)
    got = np.asarray(out["metric_depth"])[:, 0]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
