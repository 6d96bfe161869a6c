"""The r5 low-resolution probe restructuring must be EXACT (not an
approximation): both probes commute with the bilinear upsample, so
``EvalConfig.lowres_probes`` may change float association only.

Pins:
* ``resized_sq_norm`` == channel-sum-of-squares of the materialized resize,
  including the clamped edge taps (odd sizes, up/down, align_corners);
* ``cluster_lookup_resized`` == log-prob cluster lookup of the resized code;
* ``eval_logits`` lowres vs materializing path end to end.

Reference semantics being restructured: resize code -> linear log-softmax /
cluster log-probs (``src/eval_segmentation.py:156-159``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.models import probes
from depthg_tpu.ops.resize import resize_bilinear, resized_sq_norm

@pytest.mark.parametrize("hw,out,align", [
    ((40, 40), (320, 320), False),
    ((13, 17), (64, 96), False),   # odd sizes exercise the edge-clamp rows
    ((32, 32), (16, 24), False),   # downsample: several rows share taps
    ((9, 9), (33, 33), True),
])
def test_resized_sq_norm_exact(hw, out, align):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 7, *hw)).astype(np.float32)) * 3.0
    want = jnp.sum(resize_bilinear(x, out, align_corners=align) ** 2, axis=1)
    got = resized_sq_norm(x, out, align_corners=align)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_cluster_lookup_resized_matches_materialized():
    rng = np.random.default_rng(1)
    params = {"clusters": jnp.asarray(rng.standard_normal((27, 70)).astype(np.float32))}
    code = jnp.asarray(rng.standard_normal((2, 70, 40, 40)).astype(np.float32))
    want = probes.cluster_lookup_apply(
        params, resize_bilinear(code, (320, 320)), alpha=2.0, log_probs=True)
    got = probes.cluster_lookup_resized(params, code, (320, 320), alpha=2.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_eval_logits_unnormalized_is_shift_equivalent():
    """predictions() feeds the CRF unnormalized logits: softmax and argmax
    must be IDENTICAL to the normalized (log-softmax) form (r5)."""
    rng = np.random.default_rng(3)
    params = {"clusters": jnp.asarray(rng.standard_normal((27, 70)).astype(np.float32))}
    code = jnp.asarray(rng.standard_normal((2, 70, 12, 12)).astype(np.float32))
    norm_lp = probes.cluster_lookup_resized(params, code, (48, 48), 2.0,
                                            normalized=True)
    raw = probes.cluster_lookup_resized(params, code, (48, 48), 2.0,
                                        normalized=False)
    np.testing.assert_allclose(np.asarray(jax.nn.softmax(raw, axis=1)),
                               np.asarray(jax.nn.softmax(norm_lp, axis=1)),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(raw, 1)),
                                  np.asarray(jnp.argmax(norm_lp, 1)))


def test_eval_logits_lowres_matches_materialized():
    import dataclasses

    from depthg_tpu.inference import EvalConfig, eval_logits
    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init

    from depthg_tpu.models.vit import ViTConfig

    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                     img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=24,
                            vit_config=tiny, attention_impl="xla")
    key = jax.random.PRNGKey(0)
    params = {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(key, fcfg.dim, 27),
        "cluster_probe": cluster_lookup_init(key, fcfg.dim, 27),
    }
    img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 64, 64))
    ecfg = EvalConfig(n_classes=27, run_crf=False, label_res=64)
    lin_lo, clu_lo = eval_logits(params, img, fcfg,
                                 dataclasses.replace(ecfg, lowres_probes=True))
    lin_hi, clu_hi = eval_logits(params, img, fcfg,
                                 dataclasses.replace(ecfg, lowres_probes=False))
    np.testing.assert_allclose(np.asarray(lin_lo), np.asarray(lin_hi),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(clu_lo), np.asarray(clu_hi),
                               rtol=1e-4, atol=1e-5)
