"""MiDaS DPT_Large port: forward structure + converter round-trip
(reference generate_depth.py:94-113 torch.hub DPT_Large path)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.midas_dpt import (
    MidasDPTConfig,
    midas_dpt_forward,
    midas_dpt_from_torch,
    midas_dpt_init,
)

TINY = MidasDPTConfig(patch_size=16, embed_dim=64, depth=8, num_heads=4,
                      hooks=(1, 3, 5, 7), img_size=64, features=32,
                      reassemble_channels=(16, 32, 64, 64))


@pytest.fixture(scope="module")
def tiny():
    return jax.device_get(midas_dpt_init(jax.random.PRNGKey(0), TINY))


def test_forward_structure(tiny):
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 96, 64)).astype(np.float32))
    depth, hooks = jax.jit(lambda p, x: midas_dpt_forward(p, x, TINY))(tiny, x)
    assert depth.shape == (2, 96, 64)
    assert np.isfinite(np.asarray(depth)).all()
    assert float(np.asarray(depth).min()) >= 0  # relu'd relative depth
    # the 6 activations the reference taps, at MiDaS scales
    gh, gw = 96 // 16, 64 // 16
    assert hooks["l4_rn"].shape == (2, 32, gh // 2, gw // 2)
    assert hooks["r4"].shape == (2, 32, gh, gw)
    assert hooks["r3"].shape == (2, 32, gh * 2, gw * 2)
    assert hooks["r2"].shape == (2, 32, gh * 4, gw * 4)
    assert hooks["r1"].shape == (2, 32, gh * 8, gw * 8)
    assert hooks["out_conv"].shape == (2, 32, 96, 64)


def test_pos_embed_flexible_input(tiny):
    """Non-384 inputs take the bilinear _resize_pos_embed path; outputs differ
    from naive cropping and stay finite."""
    for hw in ((64, 64), (128, 96)):
        x = jnp.asarray(np.random.default_rng(1).random((1, 3, *hw)).astype(np.float32))
        depth, _ = midas_dpt_forward(tiny, x, TINY)
        assert depth.shape == (1, *hw)
        assert np.isfinite(np.asarray(depth)).all()


def test_converter_roundtrip_synthetic(tiny):
    """Synthetic torch-hub-shaped DPT_Large state dict -> identical forward."""
    pytest.importorskip("torch")

    from synthetic_data import dpt_torch_state_dict

    from depthg_tpu.utils.ckpt import vit_state_dict

    sd = {"pretrained.model." + k: v for k, v in vit_state_dict(tiny["vit"]).items()}
    sd.update(dpt_torch_state_dict(tiny["dpt"]))  # hub prefixes by default

    restored = midas_dpt_from_torch(sd)
    x = jnp.asarray(np.random.default_rng(2).random((1, 3, 64, 64)).astype(np.float32))
    a, _ = midas_dpt_forward(tiny, x, TINY)
    b, _ = midas_dpt_forward(jax.device_put(restored), x, TINY)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_fused_attention_matches_xla(tiny, monkeypatch):
    """attn_impl='fused' through the new stack-level once-per-forward
    padding (25 tokens -> 128, taps sliced back) == the xla einsum path."""
    import depthg_tpu.ops.attention as attn

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))
    x = jnp.asarray(np.random.default_rng(2).random((1, 3, 96, 64))
                    .astype(np.float32))
    ref_d, ref_h = midas_dpt_forward(tiny, x, TINY, attn_impl="xla")
    got_d, got_h = midas_dpt_forward(tiny, x, TINY, attn_impl="fused")
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=2e-5, atol=2e-5)
    for k in ref_h:
        np.testing.assert_allclose(np.asarray(got_h[k]), np.asarray(ref_h[k]),
                                   rtol=2e-5, atol=2e-5)
