"""Bisect the composed-eval TPU worker crash (VERDICT r3 "What's weak" #1).

The full eval program — backbone flip-TTA + probes + quality-default CRF +
confusion — crashes the v5e worker at batch 16 while every component passes
in isolation. Each ``--variant`` below runs ONE candidate program in this
process; drive it from a shell loop with subprocesses + health probes so a
worker crash in one variant can't poison the next.

Usage: python scripts/bisect_compose.py --variant composed-default [--batch 16]
Exit 0 = program ran and produced finite stats; nonzero = crash/error.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True)
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from depthg_tpu.inference import EvalConfig, eval_logits, predictions
    from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.ops.crf import crf_config_from_cfg, dense_crf_multi_batch
    from depthg_tpu.utils.metrics import confusion_update

    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)
    key = jax.random.PRNGKey(0)
    params = {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(key, fcfg.dim, 27),
        "cluster_probe": cluster_lookup_init(key, fcfg.dim, 27),
    }
    rng = np.random.default_rng(0)
    b = args.batch
    img = jnp.asarray(rng.standard_normal((b, 3, 320, 320)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, 27, size=(b, 320, 320)))

    base = EvalConfig(n_classes=27, run_crf=True, label_res=320,
                      crf=crf_config_from_cfg({}), backbone_dtype="bfloat16")

    def composed(ecfg):
        @jax.jit
        def step(params, img, label):
            lin, clu = predictions(params, img, fcfg, ecfg)
            return (confusion_update(lin, label, 27, 0)
                    + confusion_update(clu, label, 27, 0))
        s = np.asarray(step(params, img, label))
        assert np.isfinite(s).all()
        print(f"OK {args.variant} batch={b} stats_sum={s.sum()}", flush=True)

    v = args.variant
    if v == "composed-default":
        composed(base)
    elif v == "composed-nocache":
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, kernel_cache_mb=0)))
    elif v == "composed-cp0":
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, coarse_prefix=0)))
    elif v == "composed-f32crf":
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, dtype="float32")))
    elif v == "composed-seqtta":
        composed(dataclasses.replace(base, fused_tta=False))
    elif v == "composed-nocrf":
        composed(dataclasses.replace(base, run_crf=False))
    elif v == "composed-ds4":
        composed(dataclasses.replace(
            base, crf=crf_config_from_cfg({"crf_downsample": 4})))
    elif v == "composed-cp1":
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, coarse_prefix=1)))
    elif v == "composed-cp10":
        # ALL iterations coarse: the full-res mean-field loop never runs
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, coarse_prefix=10)))
    elif v == "composed-int8":
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, kernel_int8=True)))
    elif v == "composed-vmapcache":
        # batch_shards=2 with per-device kernels under budget flips the
        # batch strategy from lax.map to vmap while KEEPING the cache
        composed(dataclasses.replace(base, batch_shards=2))
    elif v == "composed-mapforce":
        # reproduce the r3 crash on purpose: force the lax.map sequential
        # CRF loop inside the composed program (predictions only resolves
        # "auto" -> vmap; an explicit "map" is honored). EXPECTED TO CRASH
        # the v5e worker — bisection/diagnosis use only.
        composed(dataclasses.replace(
            base, crf=dataclasses.replace(base.crf, batch_strategy="map")))
    elif v == "composed-batch4":
        # shrink only the batch (the judge's CRF-alone bisection used 4)
        args.batch = 4  # noqa: F841 — for the printout
        b = 4
        img = img[:4]
        label = label[:4]
        composed(base)
    elif v == "two-dispatch":
        # logits program, then CRF+confusion program: same math, 2 dispatches
        @jax.jit
        def logits_fn(params, img):
            return eval_logits(params, img, fcfg, base)

        @jax.jit
        def crf_fn(img, lin_log, clu_log, label):
            from depthg_tpu.inference import unnormalize_255
            lin_q, clu_q = dense_crf_multi_batch(
                unnormalize_255(img), [lin_log, clu_log], base.crf)
            lin = jnp.argmax(lin_q, 1).astype(jnp.int32)
            clu = jnp.argmax(clu_q, 1).astype(jnp.int32)
            return (confusion_update(lin, label, 27, 0)
                    + confusion_update(clu, label, 27, 0))

        lin_log, clu_log = logits_fn(params, img)
        s = np.asarray(crf_fn(img, lin_log, clu_log, label))
        assert np.isfinite(s).all()
        print(f"OK {v} batch={b} stats_sum={s.sum()}", flush=True)
    else:
        print(f"unknown variant {v!r}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
