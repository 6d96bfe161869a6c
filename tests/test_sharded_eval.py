"""Sharded eval step: 8-device mesh result == single-device result."""

import numpy as np

import jax
import jax.numpy as jnp

from depthg_tpu.inference import EvalConfig, make_eval_step
from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.ops.crf import CRFConfig
from depthg_tpu.parallel import mesh as mesh_lib


def test_sharded_eval_matches_single_device():
    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=True, label_res=32,
                      crf=CRFConfig(downsample=2, block=256))
    key = jax.random.PRNGKey(0)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, 5, size=(8, 32, 32)))

    single = make_eval_step(fcfg, ecfg, mesh=None)
    l1, c1 = single(params, img, label)

    mesh = mesh_lib.make_mesh(8)
    sharded = make_eval_step(fcfg, ecfg, mesh=mesh)
    l8, c8 = sharded(params, img, label)

    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c8))


def test_eval_step_dispatches_depth_arch():
    """dino_depth checkpoints must evaluate through the depth-fused forward
    (no-depth-embed path), not the plain featurizer."""
    from depthg_tpu.models.featurizer_depth import (
        DepthFeaturizerConfig,
        depth_featurizer_init,
    )

    tiny = ViTConfig(patch_size=8, embed_dim=384, depth=1, num_heads=2, img_size=32)
    fcfg = DepthFeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                                 vit_config=tiny, guidance="cross_attn",
                                 cross_attn_heads=4)
    key = jax.random.PRNGKey(0)
    params = {"net": depth_featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    ecfg = EvalConfig(n_classes=5, run_crf=False, label_res=32)
    step = make_eval_step(fcfg, ecfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 3, 32, 32)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, 5, size=(2, 32, 32)))
    lin, clu = step(params, img, label)
    assert int(np.asarray(lin).sum() + np.asarray(clu).sum()) > 0


def test_sharded_eval_matches_single_device_default_crf():
    """Same mesh==single check at the eval CLI's DEFAULT CRF operating point
    (ds=8 with 4-phase joint-bilateral splat/slice, bf16 state) — covers the
    _batch_apply phases-path strategy interplay with a sharded batch axis."""
    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=True, label_res=32,
                      crf=CRFConfig(downsample=8, splat_phases=4,
                                    splat_sigma_factor=1.8, dtype="bfloat16",
                                    coarse_prefix=3, block=64))
    key = jax.random.PRNGKey(1)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((8, 3, 32, 32)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, 5, size=(8, 32, 32)))

    single = make_eval_step(fcfg, ecfg, mesh=None)
    l1, c1 = single(params, img, label)

    mesh = mesh_lib.make_mesh(8)
    sharded = make_eval_step(fcfg, ecfg, mesh=mesh)
    l8, c8 = sharded(params, img, label)

    # lax.map (single) vs vmap (sharded) reorder bf16 reductions, so a pixel
    # whose top-2 probabilities sit ~1 ulp apart can legitimately argmax
    # differently — require near-equality of the confusion mass, not bits
    l1, l8, c1, c8 = (np.asarray(x) for x in (l1, l8, c1, c8))
    total = l1.sum()
    assert total == l8.sum() and c1.sum() == c8.sum()  # same pixel count
    assert np.abs(l1 - l8).sum() <= max(2, 0.005 * total)
    assert np.abs(c1 - c8).sum() <= max(2, 0.005 * total)


def test_sharded_predict_matches_single_device():
    """make_predict_step on an 8-device mesh (shard_map, preds gathered
    along batch) == single-device — the demo CLI's multi-device path."""
    from depthg_tpu.inference import make_predict_step

    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2, img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16, vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=True, label_res=32,
                      crf=CRFConfig(downsample=2, block=256))
    key = jax.random.PRNGKey(1)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    img = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((8, 3, 32, 32)).astype(np.float32))

    l1, c1 = make_predict_step(fcfg, ecfg)(params, img)
    l8, c8 = make_predict_step(fcfg, ecfg, mesh_lib.make_mesh(8))(params, img)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l8))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c8))
