"""ZoeDepth port: shape/invariant tests on a reduced config (CPU-friendly)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.zoedepth.beit import BEiTConfig, beit_forward, beit_init, relative_position_index
from depthg_tpu.models.zoedepth.dpt import DPTConfig, dpt_forward, dpt_init
from depthg_tpu.models.zoedepth.model import (
    ZoeConfig,
    prep_size,
    zoedepth_forward,
    zoedepth_infer,
    zoedepth_init,
)

TINY = ZoeConfig(
    n_bins=8, bin_embedding_dim=16,
    n_attractors=(4, 3, 2, 1),
    img_size=(64, 96),
    beit=BEiTConfig(embed_dim=64, depth=8, num_heads=4, pretrain_window=4,
                    hooks=(1, 3, 5, 7)),
    dpt=DPTConfig(embed_dim=64, features=32, reassemble_channels=(16, 32, 64, 64)),
)


def test_rel_pos_index_structure():
    idx = relative_position_index(3, 3)
    assert idx.shape == (10, 10)
    assert idx[0, 0] == 27  # (2*3-1)^2 + 2
    assert idx[0, 5] == 25 and idx[5, 0] == 26
    assert idx[5, 5] == (2 * 3 - 1) ** 2 // 2  # zero displacement at center of table
    assert idx[1:, 1:].max() < 25


def test_beit_taps_and_arbitrary_resolution():
    params = beit_init(jax.random.PRNGKey(0), TINY.beit)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 3, 64, 96)).astype(np.float32))
    taps, grid = beit_forward(params, x, TINY.beit)
    assert grid == (4, 6)  # != pretrain 4x4 window -> table resize path
    assert len(taps) == 4
    assert taps[0].shape == (1, 4 * 6 + 1, 64)


def test_dpt_hook_scales():
    bparams = beit_init(jax.random.PRNGKey(0), TINY.beit)
    dparams = dpt_init(jax.random.PRNGKey(1), TINY.dpt)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((1, 3, 64, 64)).astype(np.float32))
    taps, grid = beit_forward(bparams, x, TINY.beit)
    rel, hooks = dpt_forward(dparams, taps, grid, TINY.dpt)
    assert rel.shape == (1, 64, 64)
    f = TINY.dpt.features
    assert hooks["l4_rn"].shape == (1, f, 2, 2)    # 1/32
    assert hooks["r4"].shape == (1, f, 4, 4)       # 1/16
    assert hooks["r3"].shape == (1, f, 8, 8)
    assert hooks["r2"].shape == (1, f, 16, 16)
    assert hooks["r1"].shape == (1, f, 32, 32)     # 1/2
    assert hooks["out_conv"].shape == (1, 32, 64, 64)
    assert float(rel.min()) >= 0  # ReLU'd relative depth


def test_zoedepth_forward_and_infer():
    cfg = TINY
    params = zoedepth_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).random((1, 3, 64, 96)).astype(np.float32))
    out = zoedepth_forward(params, (x - 0.5) / 0.5, cfg, return_probs=True)
    assert out["metric_depth"].shape == (1, 1, 64, 96)
    assert float(out["metric_depth"].min()) >= 0
    probs = np.asarray(out["probs"])
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-4)  # log-binomial normalized

    depth = zoedepth_infer(params, x, cfg, pad_input=True, with_flip_aug=True)
    assert depth.shape == (1, 1, 64, 96)
    assert bool(jnp.isfinite(depth).all())


def test_prep_size_minimal_multiple_of_32():
    cfg = ZoeConfig(img_size=(384, 512))
    # "minimal" picks whichever target scale is closest to 1 and applies it to
    # both axes: 480x640 -> scale 0.8 -> 384x512
    assert prep_size(480, 640, cfg) == (384, 512)
    # already-at-scale input stays put (scale 1 exactly)
    assert prep_size(384, 512, cfg) == (384, 512)
    nh, nw = prep_size(400, 500, cfg)
    assert nh % 32 == 0 and nw % 32 == 0


def test_converter_roundtrip_synthetic():
    """Build a synthetic torch-style state dict from our params and convert back."""
    torch = pytest.importorskip("torch")
    from depthg_tpu.models.zoedepth.convert import zoe_params_from_torch

    cfg = TINY
    params = jax.device_get(zoedepth_init(jax.random.PRNGKey(2), cfg))

    sd = {}
    pre = "core.core.pretrained.model."
    bp = params["beit"]
    d = cfg.beit.embed_dim
    sd[pre + "patch_embed.proj.weight"] = torch.from_numpy(
        np.asarray(bp["patch_embed"]["w"]).T.reshape(d, 3, 16, 16).copy())
    sd[pre + "patch_embed.proj.bias"] = torch.from_numpy(np.asarray(bp["patch_embed"]["b"]))
    sd[pre + "cls_token"] = torch.from_numpy(np.asarray(bp["cls_token"]))
    for i, blk in enumerate(bp["blocks"]):
        p = f"{pre}blocks.{i}."
        sd[p + "norm1.weight"] = torch.from_numpy(np.asarray(blk["norm1"]["g"]))
        sd[p + "norm1.bias"] = torch.from_numpy(np.asarray(blk["norm1"]["b"]))
        sd[p + "attn.qkv.weight"] = torch.from_numpy(np.asarray(blk["qkv_w"]).T.copy())
        sd[p + "attn.q_bias"] = torch.from_numpy(np.asarray(blk["q_bias"]))
        sd[p + "attn.v_bias"] = torch.from_numpy(np.asarray(blk["v_bias"]))
        sd[p + "attn.proj.weight"] = torch.from_numpy(np.asarray(blk["proj"]["w"]).T.copy())
        sd[p + "attn.proj.bias"] = torch.from_numpy(np.asarray(blk["proj"]["b"]))
        sd[p + "attn.relative_position_bias_table"] = torch.from_numpy(
            np.asarray(blk["rel_pos_table"]))
        sd[p + "norm2.weight"] = torch.from_numpy(np.asarray(blk["norm2"]["g"]))
        sd[p + "norm2.bias"] = torch.from_numpy(np.asarray(blk["norm2"]["b"]))
        sd[p + "mlp.fc1.weight"] = torch.from_numpy(np.asarray(blk["fc1"]["w"]).T.copy())
        sd[p + "mlp.fc1.bias"] = torch.from_numpy(np.asarray(blk["fc1"]["b"]))
        sd[p + "mlp.fc2.weight"] = torch.from_numpy(np.asarray(blk["fc2"]["w"]).T.copy())
        sd[p + "mlp.fc2.bias"] = torch.from_numpy(np.asarray(blk["fc2"]["b"]))
        sd[p + "gamma_1"] = torch.from_numpy(np.asarray(blk["gamma_1"]))
        sd[p + "gamma_2"] = torch.from_numpy(np.asarray(blk["gamma_2"]))

    scratch = "core.core.scratch."
    post = "core.core.pretrained.act_postprocess"
    dp = params["dpt"]
    for i in range(4):
        sd[f"{post}{i+1}.0.project.0.weight"] = torch.from_numpy(
            np.asarray(dp["readout"][i]["w"]).T.copy())
        sd[f"{post}{i+1}.0.project.0.bias"] = torch.from_numpy(np.asarray(dp["readout"][i]["b"]))
        sd[f"{post}{i+1}.3.weight"] = torch.from_numpy(np.asarray(dp["reassemble"][i]["project"]["w"]))
        sd[f"{post}{i+1}.3.bias"] = torch.from_numpy(np.asarray(dp["reassemble"][i]["project"]["b"]))
    for i in (0, 1, 3):
        sd[f"{post}{i+1}.4.weight"] = torch.from_numpy(np.asarray(dp["reassemble"][i]["resample"]["w"]))
        sd[f"{post}{i+1}.4.bias"] = torch.from_numpy(np.asarray(dp["reassemble"][i]["resample"]["b"]))
    for i in range(4):
        sd[f"{scratch}layer{i+1}_rn.weight"] = torch.from_numpy(np.asarray(dp["rn"][i]["w"]))
    for j, rid in enumerate([4, 3, 2, 1]):
        fu = dp["fusion"][j]
        for name, rcu in (("resConfUnit1", fu["rcu1"]), ("resConfUnit2", fu["rcu2"])):
            for cname in ("conv1", "conv2"):
                sd[f"{scratch}refinenet{rid}.{name}.{cname}.weight"] = torch.from_numpy(
                    np.asarray(rcu[cname]["w"]))
                sd[f"{scratch}refinenet{rid}.{name}.{cname}.bias"] = torch.from_numpy(
                    np.asarray(rcu[cname]["b"]))
        sd[f"{scratch}refinenet{rid}.out_conv.weight"] = torch.from_numpy(np.asarray(fu["out"]["w"]))
        sd[f"{scratch}refinenet{rid}.out_conv.bias"] = torch.from_numpy(np.asarray(fu["out"]["b"]))
    for i, name in ((0, "output_conv.0"), (2, "output_conv.2"), (4, "output_conv.4")):
        hp = params["dpt"]["head"][f"conv{i//2+1}"]
        sd[f"{scratch}{name}.weight"] = torch.from_numpy(np.asarray(hp["w"]))
        sd[f"{scratch}{name}.bias"] = torch.from_numpy(np.asarray(hp["b"]))

    def put_mlp(prefix, mlp):
        for slot, conv in zip((0, 2), mlp):
            sd[f"{prefix}.{slot}.weight"] = torch.from_numpy(np.asarray(conv["w"]))
            sd[f"{prefix}.{slot}.bias"] = torch.from_numpy(np.asarray(conv["b"]))

    sd["conv2.weight"] = torch.from_numpy(np.asarray(params["conv2"]["w"]))
    sd["conv2.bias"] = torch.from_numpy(np.asarray(params["conv2"]["b"]))
    put_mlp("seed_bin_regressor._net", params["seed_bin_regressor"])
    put_mlp("seed_projector._net", params["seed_projector"])
    for i in range(4):
        put_mlp(f"projectors.{i}._net", params["projectors"][i])
        put_mlp(f"attractors.{i}._net", params["attractors"][i])
    put_mlp("conditional_log_binomial.mlp", params["conditional_log_binomial"])

    restored = zoe_params_from_torch(sd)
    # forward must be identical with converted params
    x = jnp.asarray(np.random.default_rng(3).random((1, 3, 64, 64)).astype(np.float32))
    a = zoedepth_forward(jax.device_put(params), (x - 0.5) * 2, cfg)["metric_depth"]
    b = zoedepth_forward(jax.device_put(restored), (x - 0.5) * 2, cfg)["metric_depth"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


@pytest.mark.parametrize("embed_dim,num_heads", [(128, 2), (192, 3)])
def test_beit_fused_attention_matches_xla(monkeypatch, embed_dim, num_heads):
    """attn_impl='fused' (whole-KV kernel + in-VMEM rel-pos bias, interpret
    mode) == the einsum path, through stack-level once-per-forward padding
    (71 tokens -> 128). (128, 2) exercises the qkv-packed head-pair kernel,
    (192, 3) the split-operand fallback (odd heads)."""
    import depthg_tpu.ops.attention as attn

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    cfg = BEiTConfig(embed_dim=embed_dim, depth=2, num_heads=num_heads,
                     pretrain_window=4, hooks=(0, 1))
    params = beit_init(jax.random.PRNGKey(3), cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 3, 112, 160)), jnp.float32)
    ref_taps, ref_grid = beit_forward(params, x, cfg)
    import dataclasses
    fused_taps, grid = beit_forward(
        params, x, dataclasses.replace(cfg, attn_impl="fused"))
    assert grid == ref_grid
    assert len(fused_taps) == len(ref_taps)
    for got, ref in zip(fused_taps, ref_taps):
        assert got.shape == ref.shape  # padding sliced back off
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_beit_int8_quantized_close_to_f32(monkeypatch):
    """quantize_beit_params (w8a8 block linears, bf16 rest) through the
    fused attention path stays feature-faithful to the f32/xla forward."""
    import dataclasses

    import depthg_tpu.ops.attention as attn
    from depthg_tpu.models.zoedepth.beit import quantize_beit_params

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    cfg = BEiTConfig(embed_dim=128, depth=2, num_heads=2, pretrain_window=4,
                     hooks=(0, 1))
    params = beit_init(jax.random.PRNGKey(5), cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 3, 112, 160)) * 0.1, jnp.float32)
    ref_taps, _ = beit_forward(params, x, cfg)
    q_taps, _ = beit_forward(quantize_beit_params(params),
                             x.astype(jnp.bfloat16),
                             dataclasses.replace(cfg, attn_impl="fused"))
    for got, ref in zip(q_taps, ref_taps):
        g, r = np.asarray(got, np.float32).ravel(), np.asarray(ref).ravel()
        cos = g @ r / (np.linalg.norm(g) * np.linalg.norm(r) + 1e-30)
        assert cos > 0.99, f"int8 BEiT diverged: cosine {cos:.4f}"
