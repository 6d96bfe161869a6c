"""Regression: the COMPOSED eval program at bench shapes on the real chip.

Round 3's showstopper (VERDICT r3 "What's weak" #1): backbone bf16 flip-TTA +
probes + the quality-default CRF + confusion-matrix update, fused in ONE jit
at batch 16, deterministically crashed the v5e TPU worker — even though every
component passed in isolation and the CRF passed alone at the same batch.

Root cause isolation (scripts/bisect_compose.py, r4 bisect matrix): the crash
required ALL of (a) the materialized bilateral kernel cache, (b) a coarse
prefix 1 <= cp < max_iter (so both the coarse loop and full-res iterations
exist), (c) ``lax.map`` one-image-at-a-time batching, and (d) a large backbone
forward in the same program. f32/bf16/int8 kernels all crash; unrolling the
coarse-prefix fori_loop does NOT help; the identical math under ``vmap``
batching passes. The fix: ``CRFConfig.batch_strategy`` with
``inference.predictions`` resolving "auto" -> "vmap" whenever the CRF is
composed with the backbone. This test pins the exact failing composition so
it can never ship crashed again.

TPU-only (run ``DEPTHG_TPU_TESTS=1 python -m pytest -m tpu``); skipped on the
CPU-forced default harness.
"""

import numpy as np
import pytest

pytestmark = [pytest.mark.tpu, pytest.mark.slow]


def _setup(n_classes=27):
    import jax

    from depthg_tpu.inference import EvalConfig
    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.ops.crf import crf_config_from_cfg

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
    key = jax.random.PRNGKey(0)
    params = {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(key, fcfg.dim, n_classes),
        "cluster_probe": cluster_lookup_init(key, fcfg.dim, n_classes),
    }
    ecfg = EvalConfig(n_classes=n_classes, run_crf=True, label_res=320,
                      crf=crf_config_from_cfg({}), backbone_dtype="bfloat16")
    return fcfg, ecfg, params


def _run_composed(fcfg, ecfg, params, b):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.inference import predictions
    from depthg_tpu.utils.metrics import confusion_update

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((b, 3, 320, 320)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, 27, size=(b, 320, 320)))

    @jax.jit
    def step(params, img, label):
        lin, clu = predictions(params, img, fcfg, ecfg)
        return (confusion_update(lin, label, 27, 0)
                + confusion_update(clu, label, 27, 0))

    stats = np.asarray(step(params, img, label))
    assert np.isfinite(stats).all()
    assert stats.sum() == 2 * float((np.asarray(label) >= 0).sum())


def test_composed_eval_batch16_default_point_runs():
    """The current eval CLI default composed at batch 16 (r5: cp5 pm-int8),
    one jit with the bf16 flip-TTA backbone + confusion. predictions() must
    route the CRF through vmap batching (cached: 16 kernels fit the budget)."""
    fcfg, ecfg, params = _setup()
    assert ecfg.crf.coarse_prefix == 5  # the r5 default point
    _run_composed(fcfg, ecfg, params, 16)


def test_composed_eval_batch16_r3_crash_shape_runs():
    """The exact composition that crashed r3, pinned EXPLICITLY (cache + cp3 +
    bf16 kernel + broadcast splat) regardless of where the default moves."""
    import dataclasses

    from depthg_tpu.ops.crf import crf_config_from_cfg

    fcfg, ecfg, params = _setup()
    crf_r3 = crf_config_from_cfg({"crf_coarse_prefix": 3,
                                  "crf_kernel_int8": False,
                                  "crf_splat_impl": "broadcast"})
    assert crf_r3.coarse_prefix == 3 and not crf_r3.kernel_int8
    _run_composed(fcfg, dataclasses.replace(ecfg, crf=crf_r3), params, 16)


def test_composed_eval_batch64_chunked_vmap_runs():
    """Batch 64 exceeds the vmap kernel-cache budget: _batch_apply must run
    UNROLLED cache-sized vmap chunks (r5) — still one composed program,
    still crash-free."""
    from depthg_tpu.ops.crf import _VMAP_KERNEL_BUDGET_BYTES, _kernel_cache_bytes

    fcfg, ecfg, params = _setup()
    n_pts = (320 // 8) ** 2 * 4
    per_img = _kernel_cache_bytes(n_pts, ecfg.crf)
    assert per_img is not None and 64 * per_img > _VMAP_KERNEL_BUDGET_BYTES
    _run_composed(fcfg, ecfg, params, 64)
