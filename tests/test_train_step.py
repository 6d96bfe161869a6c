"""Training step: runs on a virtual 8-device mesh, optimizes, and matches
single-device execution bit-for-bit (sharding correctness)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models.featurizer import FeaturizerConfig
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.parallel import mesh as mesh_lib
from depthg_tpu.train import losses as loss_lib
from depthg_tpu.train import step as step_lib

TINY_VIT = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
FCFG = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=TINY_VIT)
HP = step_lib.TrainHParams(n_classes=3, lr=1e-3)
LCFG = loss_lib.CorrLossConfig(feature_samples=3, neg_samples=2, depth_sampling="fps",
                               depth_feat_correlation_loss=True)


def _batch(rng, b=8):
    return {
        "img": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "img_pos": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "label": rng.integers(-1, 3, size=(b, 32, 32)),
        "depth": rng.random((b, 1, 32, 32)).astype(np.float32),
        "depth_pos": rng.random((b, 1, 32, 32)).astype(np.float32),
    }


@functools.partial(jax.jit, static_argnums=(3,))
def _jit_step(state, batch, key, n_classes_unused):
    return step_lib.train_step(state, batch, key, FCFG, HP, LCFG, 0.19, 0.03)


@pytest.mark.slow
def test_train_step_runs_and_learns():
    key = jax.random.PRNGKey(0)
    state = step_lib.init_state(key, FCFG, HP)
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}

    losses = []
    for i in range(5):
        state, logs = _jit_step(state, batch, jax.random.PRNGKey(i), 3)
        losses.append(float(logs["loss/total"]))
    assert all(np.isfinite(losses))
    assert int(state["step"]) == 5
    # probes optimize quickly on a fixed batch: cluster+linear loss must drop
    assert losses[-1] < losses[0]


def test_sharded_matches_single_device():
    mesh = mesh_lib.make_mesh(8)
    assert mesh.devices.size == 8

    key = jax.random.PRNGKey(1)
    state = step_lib.init_state(key, FCFG, HP)
    rng = np.random.default_rng(1)
    batch_np = _batch(rng)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    state1, logs1 = _jit_step(state, batch, jax.random.PRNGKey(0), 3)

    sharded_batch = mesh_lib.shard_batch(batch, mesh)
    state_rep = mesh_lib.replicate(state, mesh)
    state8, logs8 = _jit_step(state_rep, sharded_batch, jax.random.PRNGKey(0), 3)

    np.testing.assert_allclose(float(logs1["loss/total"]), float(logs8["loss/total"]),
                               rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(state1["params"])
    l8 = jax.tree_util.tree_leaves(state8["params"])
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-4)


def test_reset_probes_changes_only_probes():
    state = step_lib.init_state(jax.random.PRNGKey(2), FCFG, HP)
    new = step_lib.reset_probes(state, jax.random.PRNGKey(3), FCFG, HP)
    assert np.allclose(np.asarray(new["params"]["net"]["cluster1"]["w"]),
                       np.asarray(state["params"]["net"]["cluster1"]["w"]))
    assert not np.allclose(np.asarray(new["params"]["cluster_probe"]["clusters"]),
                           np.asarray(state["params"]["cluster_probe"]["clusters"]))


def test_fused_pair_forward_matches_unfused():
    """fused_pair_forward stacks img/img_pos into ONE backbone pass; with
    dropout rate 0 (the only rng the featurizer consumes — the projection
    head's Dropout2d runs in train mode regardless of ``fcfg.dropout``,
    mirroring reference src/modules.py:128-137) the per-sample math is
    identical to the reference's two-forward structure, so the whole loss
    decomposition must agree to float tolerance."""
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=TINY_VIT, dropout=False, drop_rate=0.0)
    rng = np.random.default_rng(7)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    key = jax.random.PRNGKey(5)
    state = step_lib.init_state(jax.random.PRNGKey(4), fcfg, HP)

    logs = {}
    for fused in (True, False):
        hp = step_lib.TrainHParams(n_classes=3, lr=1e-3,
                                   fused_pair_forward=fused)
        step = jax.jit(lambda s, b, k, h: step_lib.train_step(
            s, b, k, fcfg, h, LCFG, 0.19, 0.03), static_argnums=(3,))
        _, logs[fused] = step(state, batch, key, hp)

    for name in ("loss/total", "loss/pos_intra", "loss/pos_inter",
                 "loss/neg_inter", "loss/depth_feat", "loss/linear",
                 "loss/cluster"):
        np.testing.assert_allclose(float(logs[True][name]),
                                   float(logs[False][name]),
                                   rtol=2e-5, atol=2e-6, err_msg=name)


@pytest.mark.slow
def test_train_step_int8_backbone_runs():
    """backbone_dtype="int8" through the FULL train step (the combination
    the device decision matrix times): the w8a8 frozen forward feeds the
    same loss stack; the step must run, optimize, and land near the f32
    objective (quantization of a random-init tiny ViT is the worst case,
    so the bound is loose — fidelity on the real arch is pinned to >0.99
    cosine in tests/test_int8_backbone.py)."""
    rng = np.random.default_rng(11)
    batch = {k: jnp.asarray(v) for k, v in _batch(rng).items()}
    key = jax.random.PRNGKey(6)
    state = step_lib.init_state(jax.random.PRNGKey(4), FCFG, HP)

    logs = {}
    for bdt in ("float32", "int8"):
        hp = step_lib.TrainHParams(n_classes=3, lr=1e-3, backbone_dtype=bdt,
                                   fused_pair_forward=True)
        step = jax.jit(lambda s, b, k, h: step_lib.train_step(
            s, b, k, FCFG, h, LCFG, 0.19, 0.03), static_argnums=(3,))
        st, logs[bdt] = step(state, batch, key, hp)
        assert int(st["step"]) == 1

    t32, t8 = float(logs["float32"]["loss/total"]), float(logs["int8"]["loss/total"])
    assert np.isfinite(t8), "int8 train step produced non-finite loss"
    assert abs(t8 - t32) < 0.5 * abs(t32) + 0.1, (t8, t32)


def test_tta_code_fused_matches_two_forwards():
    """The stacked [2B] flip-TTA forward equals the two-dispatch formulation
    (reference eval_segmentation.py:150-152) per sample."""
    from depthg_tpu.inference import tta_code
    from depthg_tpu.models import featurizer as featurizer_lib

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=TINY_VIT)
    params = featurizer_lib.featurizer_init(jax.random.PRNGKey(6), fcfg)
    img = jnp.asarray(np.random.default_rng(8).standard_normal(
        (4, 3, 32, 32)).astype(np.float32))

    fused = tta_code(params, img, fcfg, fused=True)
    c1 = featurizer_lib.dispatch_apply(params, img, fcfg)["code"]
    c2 = featurizer_lib.dispatch_apply(params, img[..., ::-1], fcfg)["code"]
    np.testing.assert_allclose(np.asarray(fused),
                               np.asarray((c1 + c2[..., ::-1]) / 2),
                               rtol=1e-5, atol=1e-5)
    # fused=False (the r5 default, EvalConfig.fused_tta) IS the two-forward
    # formulation — exact equality, not tolerance
    unfused = tta_code(params, img, fcfg, fused=False)
    np.testing.assert_array_equal(np.asarray(unfused),
                                  np.asarray((c1 + c2[..., ::-1]) / 2))
    # backbone_sub_batch chunking (r5): per-sample math unchanged — chunked
    # sub-passes concatenate to the unchunked result exactly
    chunked = tta_code(params, img, fcfg, fused=False, sub_batch=2)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(unfused),
                               rtol=1e-6, atol=1e-6)


def test_cross_entropy_axis1_matches_channel_last():
    """The NCHW (class_axis=1) CE must equal the channel-last formulation and
    torch's CrossEntropyLoss semantics (ignore out-of-range labels)."""
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.standard_normal((4, 27, 17, 19)).astype(np.float32))
    labels = jnp.asarray(rng.integers(-1, 28, size=(4, 17, 19)).astype(np.int32))

    v1 = step_lib.cross_entropy_masked(
        jnp.transpose(logits, (0, 2, 3, 1)), labels, 27)
    v2 = step_lib.cross_entropy_masked(logits, labels, 27, class_axis=1)
    assert np.allclose(np.asarray(v1), np.asarray(v2), rtol=0, atol=1e-6)

    # hand-checked reference on the masked pixels
    lp = np.asarray(jax.nn.log_softmax(logits, axis=1))
    lb = np.asarray(labels)
    mask = (lb >= 0) & (lb < 27)
    picked = np.take_along_axis(lp, np.clip(lb, 0, 26)[:, None], axis=1)[:, 0]
    expected = -(picked * mask).sum() / mask.sum()
    assert np.allclose(np.asarray(v2), expected, atol=1e-5)

    with pytest.raises(ValueError):
        step_lib.cross_entropy_masked(logits, labels, 27, class_axis=2)
