"""Reproducible performance decision matrices for the hot paths.

The headline number lives in ``bench.py``; this harness produces the A/B
matrices the defaults are chosen FROM, with the same methodology —
dependent-chain ``fori_loop`` timing (the carry perturbs every input so XLA
cannot hoist the frozen forwards) with the dispatch round-trip subtracted
(``utils/profiling.dispatch_rtt``), median over repeats. The reference has
no perf tooling at all; its eval wall time is CPU-CRF-bound
(``src/crf.py:22-45``) so a/b'ing device paths was never needed there.

Subcommands:
  fwd    featurizer forward: attention_impl x backbone_dtype at eval/train res
  train  full production train_step: attention_impl x backbone_dtype
  zoe    ZoeDepth forward: BEiT attn_impl (xla|fused) x dtype (bf16|int8) x batch
  attn   raw attention kernel sweep at a given padded sequence length
  eval   fused eval step at the CLI default: full vs no-CRF vs unfused TTA

``--tiny`` swaps in reduced model configs so the plumbing runs on CPU in
seconds (numbers are then meaningless — it exists for smoke tests/CI).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _setup():
    import jax  # noqa: F401

    from depthg_tpu.utils.profiling import dispatch_rtt

    rtt = dispatch_rtt(repeats=5)
    print(f"rtt {rtt * 1e3:.1f} ms", flush=True)
    return rtt


def _fcfg(tiny: bool):
    from depthg_tpu.models.featurizer import FeaturizerConfig
    from depthg_tpu.models.vit import ViTConfig

    if tiny:
        return FeaturizerConfig(
            arch="vit_small", patch_size=8, dim=16,
            vit_config=ViTConfig(patch_size=8, embed_dim=128, depth=2,
                                 num_heads=2, img_size=32))
    return FeaturizerConfig(arch="vit_small", patch_size=8, dim=70)


def cmd_fwd(args):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.models import featurizer as featurizer_lib
    from depthg_tpu.models.featurizer import featurizer_init
    from depthg_tpu.utils.profiling import median_time

    rtt = _setup()
    base = _fcfg(args.tiny)
    params = featurizer_init(jax.random.PRNGKey(0), base)
    rng = np.random.default_rng(0)
    shapes = ((64, "eval"), (32, "train")) if args.tiny else \
        ((320, "eval"), (224, "train"))
    for res, tag in shapes:
        img = jnp.asarray(rng.standard_normal(
            (args.batch, 3, res, res)).astype(np.float32))
        for impl in args.attn.split(","):
            fcfg = dataclasses.replace(base, attention_impl=impl)
            for bdt in args.dtypes.split(","):
                @jax.jit
                def loop(p, im, fcfg=fcfg, bdt=bdt):
                    def body(i, carry):
                        c = featurizer_lib.dispatch_apply(
                            p, im + carry * 1e-9, fcfg,
                            backbone_dtype=None if bdt == "float32" else bdt,
                        )["code"]
                        return carry + c.sum().astype(jnp.float32) * 1e-9
                    return jax.lax.fori_loop(0, args.iters, body,
                                             jnp.float32(0))

                try:
                    float(loop(params, img))
                    dt = (median_time(lambda: float(loop(params, img)),
                                      args.repeats) - rtt) / args.iters
                    print(f"{tag}@{res} attn={impl:5s} {bdt:9s}: "
                          f"{dt * 1e3:7.2f} ms/forward-b{args.batch} "
                          f"({args.batch / dt:7.1f} img/s)", flush=True)
                except Exception as e:
                    print(f"{tag}@{res} attn={impl:5s} {bdt:9s}: FAILED "
                          f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def cmd_train(args):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.train import losses as loss_lib
    from depthg_tpu.train import step as step_lib
    from depthg_tpu.utils.profiling import median_time

    rtt = _setup()
    base = _fcfg(args.tiny)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    res = 32 if args.tiny else 224
    lcfg = loss_lib.CorrLossConfig(
        feature_samples=3 if args.tiny else 11, neg_samples=5,
        depth_sampling="fps", depth_feat_correlation_loss=True)
    hp0 = step_lib.TrainHParams(n_classes=27)
    state = step_lib.init_state(key, base, hp0)
    b = args.batch
    tb = {
        "img": jnp.asarray(rng.standard_normal((b, 3, res, res)).astype(np.float32)),
        "img_pos": jnp.asarray(rng.standard_normal((b, 3, res, res)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(-1, 27, size=(b, res, res))),
        "depth": jnp.asarray(rng.random((b, 1, res, res)).astype(np.float32)),
        "depth_pos": jnp.asarray(rng.random((b, 1, res, res)).astype(np.float32)),
    }
    for impl in args.attn.split(","):
        fcfg = dataclasses.replace(base, attention_impl=impl)
        for bdt in args.dtypes.split(","):
            hp = step_lib.TrainHParams(n_classes=27, backbone_dtype=bdt)

            @jax.jit
            def train_loop(state, batch_, hp=hp, fcfg=fcfg):
                def body(i, carry):
                    st, tot = carry
                    b2 = {k: v + (tot * 1e-12).astype(v.dtype)
                          if jnp.issubdtype(v.dtype, jnp.floating) else v
                          for k, v in batch_.items()}
                    st, logs = step_lib.train_step(
                        st, b2, jax.random.fold_in(key, i), fcfg, hp, lcfg,
                        0.19, 0.03)
                    return st, tot + logs["loss/total"].astype(jnp.float32)
                _, tot = jax.lax.fori_loop(0, args.iters, body,
                                           (state, jnp.float32(0)))
                return tot

            try:
                float(train_loop(state, tb))
                dt = (median_time(lambda: float(train_loop(state, tb)),
                                  args.repeats) - rtt) / args.iters
                print(f"train attn={impl:5s} {bdt:9s}: {dt * 1e3:7.2f} "
                      f"ms/step ({b / dt:7.1f} img/s)", flush=True)
            except Exception as e:
                print(f"train attn={impl:5s} {bdt:9s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def cmd_zoe(args):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.models.layers import cast_tree_bf16
    from depthg_tpu.models.zoedepth import ZoeConfig, zoedepth_forward, zoedepth_init
    from depthg_tpu.models.zoedepth.beit import BEiTConfig, quantize_beit_params
    from depthg_tpu.models.zoedepth.dpt import DPTConfig
    from depthg_tpu.utils.profiling import median_time

    rtt = _setup()
    if args.tiny:
        base = ZoeConfig(
            n_bins=4, bin_embedding_dim=8, n_attractors=(2, 2, 1, 1),
            img_size=(64, 96),
            beit=BEiTConfig(embed_dim=64, depth=4, num_heads=4,
                            pretrain_window=4, hooks=(0, 1, 2, 3)),
            dpt=DPTConfig(embed_dim=64, features=16,
                          reassemble_channels=(8, 16, 32, 32)))
        shapes = ((1, (64, 96)),)
    else:
        base = ZoeConfig()
        shapes = ((1, (384, 384)), (1, (384, 512)), (4, (384, 512)),
                  (8, (384, 512)))
    with jax.default_device(jax.devices("cpu")[0]):
        host = zoedepth_init(jax.random.PRNGKey(0), base, jnp.bfloat16)
        host_q = {k: (quantize_beit_params(v) if k == "beit"
                      else cast_tree_bf16(v)) for k, v in host.items()}
    params = jax.device_put(host)
    params_q = jax.device_put(host_q)
    rng = np.random.default_rng(0)
    for b, hw in shapes:
        img = jnp.asarray(rng.standard_normal((b, 3, *hw)).astype(np.float32),
                          jnp.bfloat16)
        outs = {}
        for arm in args.arms.split(","):
            impl = "fused" if "fused" in arm else "xla"
            p = params_q if "int8" in arm else params
            cfg = dataclasses.replace(
                base, beit=dataclasses.replace(base.beit, attn_impl=impl))

            @jax.jit
            def loop(p, im, cfg=cfg):
                def body(i, carry):
                    d = zoedepth_forward(p, im + carry * 1e-9,
                                         cfg)["metric_depth"]
                    return carry + d.sum().astype(jnp.float32) * 1e-9
                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

            @jax.jit
            def once(p, im, cfg=cfg):
                return zoedepth_forward(p, im, cfg)["metric_depth"]

            try:
                outs[arm] = np.asarray(jax.device_get(
                    once(p, img).astype(jnp.float32)))
                float(loop(p, img))
                dt = (median_time(lambda: float(loop(p, img)), args.repeats)
                      - rtt) / args.iters
                print(f"b{b}@{hw[0]}x{hw[1]} {arm:10s}: {dt * 1e3:7.2f} "
                      f"ms/forward ({b / dt:6.2f} img/s)", flush=True)
            except Exception as e:
                print(f"b{b}@{hw[0]}x{hw[1]} {arm:10s}: FAILED "
                      f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        ref = args.arms.split(",")[0]
        for arm, out in outs.items():
            if arm == ref or ref not in outs:
                continue
            a, c = outs[ref].ravel(), out.ravel()
            cos = float(a @ c / (np.linalg.norm(a) * np.linalg.norm(c) + 1e-30))
            print(f"  fidelity {arm} vs {ref}: cosine {cos:.6f}", flush=True)


def cmd_eval(args):
    """Decompose the eval step at the CLI-default operating point: the full
    fused program (TTA backbone + probes + dense CRF + confusion), the same
    program with the CRF off, and the derived CRF share. This is the matrix
    behind reading bench.py's headline correctly: the quality-default CRF
    (ds=8 jbu4, docs/CRF_FIDELITY.md) is HBM-bound splat/slice, so its cost
    shows up in wall time but barely in cost_analysis() flops."""
    import jax
    import jax.numpy as jnp

    from depthg_tpu.inference import EvalConfig, predictions
    from depthg_tpu.models.featurizer import featurizer_init
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.ops.crf import crf_config_from_cfg
    from depthg_tpu.utils.metrics import confusion_update
    from depthg_tpu.utils.profiling import median_time

    rtt = _setup()
    fcfg = _fcfg(args.tiny)
    res = 64 if args.tiny else 320
    nc = 27
    key = jax.random.PRNGKey(0)
    params = {
        "net": featurizer_init(key, fcfg),
        "linear_probe": linear_probe_init(key, fcfg.dim, nc),
        "cluster_probe": cluster_lookup_init(key, fcfg.dim, nc),
    }
    rng = np.random.default_rng(0)
    b = args.batch
    img = jnp.asarray(rng.standard_normal((b, 3, res, res)).astype(np.float32))
    label = jnp.asarray(rng.integers(-1, nc, size=(b, res, res)))
    crf = crf_config_from_cfg({})  # the CLIs' own default operating point
    arms = {
        "full (eval default)": EvalConfig(n_classes=nc, run_crf=True,
                                          label_res=res, crf=crf,
                                          backbone_dtype="bfloat16"),
        "nocrf": EvalConfig(n_classes=nc, run_crf=False, label_res=res,
                            backbone_dtype="bfloat16"),
        "unfused-tta": EvalConfig(n_classes=nc, run_crf=True, label_res=res,
                                  crf=crf, backbone_dtype="bfloat16",
                                  fused_tta=False),
    }
    times = {}
    for name, ecfg in arms.items():
        @jax.jit
        def loop(p, im, lb, ecfg=ecfg):
            def body(i, carry):
                lin, clu = predictions(p, im + carry * 1e-9, fcfg, ecfg)
                s = (confusion_update(lin, lb, nc, 0)
                     + confusion_update(clu, lb, nc, 0)).sum()
                return carry + s.astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        try:
            float(loop(params, img, label))
            dt = (median_time(lambda: float(loop(params, img, label)),
                              args.repeats) - rtt) / args.iters
            times[name] = dt
            print(f"eval@{res} {name:20s}: {dt * 1e3:7.2f} ms/step-b{b} "
                  f"({b / dt:7.1f} img/s)", flush=True)
        except Exception as e:
            print(f"eval@{res} {name:20s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
    if "full (eval default)" in times and "nocrf" in times:
        crf_ms = (times["full (eval default)"] - times["nocrf"]) * 1e3
        print(f"derived CRF share: {crf_ms:.2f} ms/step-b{b} "
              f"({crf_ms / b:.2f} ms/img)", flush=True)


def cmd_attn(args):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops.attention import whole_kv_mha_qkv
    from depthg_tpu.utils.profiling import median_time

    rtt = _setup()
    b, h, hd = args.batch, 6, 64
    n = args.seq
    npad = -(-n // 128) * 128
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, npad, 3 * h * hd)),
                      jnp.bfloat16)
    for bq in (None, 128, 256, 512):
        if bq and npad % bq:
            continue

        @jax.jit
        def loop(x, bq=bq):
            def body(i, carry):
                o = whole_kv_mha_qkv(x + carry * 1e-9, h, 0.125, n_valid=n,
                                     block_q=bq)
                return carry + o.sum().astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

        try:
            float(loop(qkv))
            dt = (median_time(lambda: float(loop(qkv)), args.repeats)
                  - rtt) / args.iters
            print(f"whole_kv seq={n}(pad {npad}) block_q={bq}: "
                  f"{dt * 1e3:7.3f} ms/call", flush=True)
        except Exception as e:
            print(f"block_q={bq}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser("perf_matrix")
    sub = p.add_subparsers(dest="cmd", required=True)
    for name, fn in (("fwd", cmd_fwd), ("train", cmd_train),
                     ("zoe", cmd_zoe), ("attn", cmd_attn),
                     ("eval", cmd_eval)):
        sp = sub.add_parser(name)
        sp.set_defaults(fn=fn)
        sp.add_argument("--tiny", action="store_true")
        sp.add_argument("--iters", type=int, default=10)
        sp.add_argument("--repeats", type=int, default=5)
        sp.add_argument("--batch", type=int, default=16)
        if name in ("fwd", "train"):
            sp.add_argument("--attn", default="flash,fused")
            sp.add_argument("--dtypes", default="bfloat16,int8")
        if name == "zoe":
            sp.add_argument("--arms", default="xla,fused,fused_int8")
        if name == "attn":
            sp.add_argument("--seq", type=int, default=1601)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
