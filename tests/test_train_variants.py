"""Training-step variants: dino_depth arch, LHP, depth_only_intra."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.featurizer_depth import DepthFeaturizerConfig
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.train import losses as loss_lib
from depthg_tpu.train import step as step_lib

TINY_VIT = ViTConfig(patch_size=8, embed_dim=384, depth=1, num_heads=2, img_size=32)
LCFG = loss_lib.CorrLossConfig(feature_samples=3, neg_samples=2, depth_sampling="fps",
                               depth_feat_correlation_loss=True)


def _batch(rng, b=4):
    return {k: jnp.asarray(v) for k, v in {
        "img": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "img_pos": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "label": rng.integers(-1, 3, size=(b, 32, 32)),
        "depth": rng.random((b, 1, 32, 32)).astype(np.float32),
        "depth_pos": rng.random((b, 1, 32, 32)).astype(np.float32),
    }.items()}


def _run_steps(fcfg, hp, lcfg, n=2):
    state = step_lib.init_state(jax.random.PRNGKey(0), fcfg, hp)
    rng = np.random.default_rng(0)
    batch = _batch(rng)

    @jax.jit
    def jstep(state, batch, key):
        return step_lib.train_step(state, batch, key, fcfg, hp, lcfg, 0.19, 0.03)

    logs = None
    for i in range(n):
        state, logs = jstep(state, batch, jax.random.PRNGKey(i))
    return state, logs


def test_dino_depth_arch_trains():
    fcfg = DepthFeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                                 vit_config=TINY_VIT, guidance="cross_attn",
                                 cross_attn_heads=4)
    hp = step_lib.TrainHParams(n_classes=3)
    state, logs = _run_steps(fcfg, hp, LCFG)
    assert np.isfinite(float(logs["loss/total"]))
    # cross-attn fusion params exist and were optimized along with the head
    assert "cross_attn" in state["params"]["net"]


def test_lhp_variant_trains_and_keeps_lhp_frozen():
    from depthg_tpu.models.featurizer import FeaturizerConfig

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=TINY_VIT)
    hp = step_lib.TrainHParams(n_classes=3, lhp=True, lhp_weight=0.2)
    state0 = step_lib.init_state(jax.random.PRNGKey(0), fcfg, hp)
    assert "lhp" in state0["frozen"]

    state, logs = _run_steps(fcfg, hp, LCFG)
    assert np.isfinite(float(logs["loss/total"]))
    assert "loss/lhp_pos_intra" in logs
    # the LHP head must stay at its init values (never optimized, as in ref)
    a = jax.tree_util.tree_leaves(state0["frozen"]["lhp"])
    b = jax.tree_util.tree_leaves(state["frozen"]["lhp"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_depth_only_intra_variant():
    from depthg_tpu.models.featurizer import FeaturizerConfig

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=TINY_VIT)
    hp = step_lib.TrainHParams(n_classes=3, use_depth_only_intra=True)
    lcfg = loss_lib.CorrLossConfig(feature_samples=3, neg_samples=2,
                                   depth_sampling="none",
                                   depth_feat_correlation_loss=False)
    state, logs = _run_steps(fcfg, hp, lcfg)
    assert np.isfinite(float(logs["loss/total"]))
    assert "loss/depth_feat" not in logs


@pytest.mark.slow
def test_feature_pyramid_arch_trains():
    """arch="feature-pyramid" (reference src/train_segmentation.py:99-101)
    trains through the same step: frozen ResNet in `frozen`, pyramid head +
    probes optimized, DoubleConv BN running stats updated."""
    from depthg_tpu.models.pyramid import PyramidConfig

    fcfg = PyramidConfig(granularity=2, dim=16, out_size=16)
    hp = step_lib.TrainHParams(n_classes=3)
    state0 = step_lib.init_state(jax.random.PRNGKey(0), fcfg, hp)
    assert "vit" in state0["frozen"]  # generic frozen-backbone slot = ResNet
    assert "conv2" in state0["params"]["net"]

    state, logs = _run_steps(fcfg, hp, LCFG)
    assert np.isfinite(float(logs["loss/total"]))
    # head convs moved; BN running stats folded in (train-mode forwards)
    w0 = np.asarray(state0["params"]["net"]["cluster1"]["w"])
    w1 = np.asarray(state["params"]["net"]["cluster1"]["w"])
    assert np.abs(w1 - w0).max() > 0
    bn = state["params"]["net"]["conv2"]["bn1"]
    assert float(np.abs(np.asarray(bn["mean"])).max()) > 0  # init was zeros
    # frozen ResNet untouched
    a = jax.tree_util.tree_leaves(state0["frozen"]["vit"])
    b = jax.tree_util.tree_leaves(state["frozen"]["vit"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
