"""Surgical decomposition of the eval CRF cost at bench shapes.

bench.py's headline is the fused eval program (backbone + probes + CRF +
confusion) at batch 16/320px; docs/PERFORMANCE.md attributes ~2/3 of it to
the quality-default CRF. This script times each *component* of that CRF as
its own dependent-chain program (same calibration as bench.py:
``dispatch_rtt`` subtraction, median over repeats) so optimization effort
lands where the milliseconds are:

* the full CRF at coarse-prefix 0/3/5/10 (differences = per-iteration cost
  of a full-res vs coarse mean-field iteration),
* the materialized-kernel build alone (the once-per-batch exp cost),
* the splat/slice transfer operator alone (the HBM-bound broadcast),
* the exact separable Gaussian alone (MXU banded matmuls),
* the stacked blockwise softmax alone (f32 unary math),
* kernel_int8 on/off at the default point.

Usage::

    python scripts/profile_crf.py [--batch 16] [--size 320] [--iters 5]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=320)
    ap.add_argument("--iters", type=int, default=5,
                    help="fori_loop trips inside each timed program")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops import crf as crf_lib
    from depthg_tpu.ops.crf import (CRFConfig, crf_config_from_cfg,
                                    dense_crf_multi_batch)
    from depthg_tpu.utils.profiling import dispatch_rtt, median_time

    rtt = dispatch_rtt()
    print(f"devices={jax.devices()} rtt={rtt * 1e3:.1f} ms", flush=True)

    b, hw = args.batch, args.size
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 255, (b, 3, hw, hw)).astype(np.float32))
    lin = jnp.asarray(rng.standard_normal((b, 27, hw // 8, hw // 8)).astype(np.float32))
    clu = jnp.asarray(rng.standard_normal((b, 27, hw // 8, hw // 8)).astype(np.float32))

    def timed(make_loop, label):
        """make_loop() -> jitted fn(carry)->carry running args.iters trips."""
        try:
            loop = make_loop()
            float(loop(jnp.float32(0)))  # compile + warm
            dt = (median_time(lambda: float(loop(jnp.float32(0))),
                              args.repeats) - rtt) / args.iters
            print(f"{label:44s}: {dt * 1e3:8.2f} ms/call-b{b} "
                  f"({dt / b * 1e3:6.3f} ms/img)", flush=True)
            return dt
        except Exception as e:  # keep profiling the rest
            print(f"{label:44s}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return float("nan")

    # --- whole-CRF arms: vary coarse_prefix and kernel_int8 -----------------
    # the eval default: ds=8 jbu4 sf1.8 cp5 bf16 pm-int8 (r5)
    base = crf_config_from_cfg({})
    results = {}
    for name, ccfg in [
        ("crf cp0", crf_config_from_cfg({"crf_coarse_prefix": 0})),
        ("crf cp3", crf_config_from_cfg({"crf_coarse_prefix": 3})),
        ("crf cp5 (default)", base),
        ("crf cp10 (all coarse)", crf_config_from_cfg({"crf_coarse_prefix": 10})),
        ("crf cp5 bf16-kernel", crf_config_from_cfg({"crf_kernel_int8": False})),
        ("crf cp5 broadcast", crf_config_from_cfg({"crf_splat_impl": "broadcast"})),
    ]:
        import dataclasses
        ccfg = dataclasses.replace(ccfg, batch_strategy="vmap")

        def make_loop(ccfg=ccfg):
            @jax.jit
            def loop(carry):
                def body(i, c):
                    lq, cq = dense_crf_multi_batch(
                        img + c * 1e-9, [lin, clu], ccfg)
                    return c + lq.sum().astype(jnp.float32) * 1e-12
                return jax.lax.fori_loop(0, args.iters, body, carry)
            return loop

        results[name] = timed(make_loop, name)

    if np.isfinite(results.get("crf cp0", np.nan)) and \
            np.isfinite(results.get("crf cp10 (all coarse)", np.nan)):
        per_full = (results["crf cp0"] - results["crf cp10 (all coarse)"]) / 10
        print(f"  -> full-res iteration: {per_full * 1e3:.2f} ms/call "
              f"({per_full / b * 1e3:.3f} ms/img)", flush=True)
        print(f"  -> fixed floor (build+unary+handoff): "
              f"{results['crf cp10 (all coarse)'] * 1e3:.2f} ms/call", flush=True)

    # --- component arms: operator pieces at the default point ---------------
    ds = base.downsample
    dt_state = jnp.bfloat16 if base.dtype == "bfloat16" else jnp.float32
    phases = crf_lib._jbu_phases(base, hw, hw)
    q0 = jnp.asarray(
        rng.uniform(0.01, 1.0, (b, 54, hw, hw)).astype(np.float32)).astype(dt_state)

    def comp_build():
        @jax.jit
        def loop(carry):
            def one(im):
                _, deg, _, _ = crf_lib._jbu_operator(im, base, ds, dt_state, phases)
                return deg.sum()
            def body(i, c):
                s = jax.vmap(one)(img + c * 1e-9).sum()
                return c + s.astype(jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, args.iters, body, carry)
        return loop

    timed(comp_build, "jbu build (kernel+2 degree transfers)")

    def comp_splat_slice():
        @jax.jit
        def loop(carry):
            def one(im, q):
                apply_a, _, _, _ = crf_lib._jbu_operator(im, base, ds, dt_state, phases)
                # apply the transfer operator iters times back to back
                def body(i, qq):
                    return apply_a(qq) + qq * 1e-9
                return jax.lax.fori_loop(0, args.iters, body, q).sum()
            s = jax.vmap(one)(img + carry * 1e-9, q0).sum()
            return carry + s.astype(jnp.float32) * 1e-12
        return loop

    dt_ss = timed(comp_splat_slice, f"jbu build + {args.iters}x splat/slice")

    def comp_gauss():
        @jax.jit
        def loop(carry):
            def one(q):
                def body(i, qq):
                    return crf_lib._gaussian_filter(qq, base.pos_xy_std) * 1e-3
                return jax.lax.fori_loop(0, args.iters, body, q).sum()
            s = jax.vmap(one)(q0 + carry.astype(dt_state) * 1e-9).sum()
            return carry + s.astype(jnp.float32) * 1e-12
        return loop

    timed(comp_gauss, "exact separable Gaussian (per iter)")

    def comp_softmax():
        @jax.jit
        def loop(carry):
            def one(q):
                def body(i, qq):
                    parts = jnp.split(qq, [27], axis=0)
                    return jnp.concatenate(
                        [jax.nn.softmax(p.astype(jnp.float32), axis=0)
                         for p in parts], axis=0).astype(dt_state) + qq * 1e-9
                return jax.lax.fori_loop(0, args.iters, body, q).sum()
            s = jax.vmap(one)(q0 + carry.astype(dt_state) * 1e-9).sum()
            return carry + s.astype(jnp.float32) * 1e-12
        return loop

    timed(comp_softmax, "blockwise f32 softmax (per iter)")

    # --- splat/slice formulation A/B: broadcast-reduce (current) vs batched
    # matmul (einsum -> dot_general with batch dims (i, j)). Same math; the
    # broadcast form runs on the VPU as a fused multiply-reduce, the einsum
    # form feeds 1600 tiny [C, ds^2] x [ds^2, P] GEMMs to the MXU.
    p_n = len(phases)
    hd = hw // ds
    wmock = jnp.asarray(
        rng.uniform(0.0, 1.0, (b, p_n, hd, ds, hd, ds)).astype(np.float32))
    c_ch = 54
    qfull = q0  # [b, 54, hw, hw] in the state dtype

    def splat_bcast(q, w):
        qc = q.reshape(c_ch, hd, ds, hd, ds)
        return jnp.sum(qc[None] * w.astype(q.dtype)[:, None], axis=(3, 5))

    def splat_einsum(q, w):
        qc = q.reshape(c_ch, hd, ds, hd, ds)
        return jnp.einsum("ciajb,piajb->pcij", qc, w.astype(q.dtype))

    def slice_bcast(m, w):
        out = jnp.sum(m[:, :, :, None, :, None] * w.astype(m.dtype)[:, None],
                      axis=0)
        return out.reshape(c_ch, hw, hw)

    def slice_einsum(m, w):
        out = jnp.einsum("pcij,piajb->ciajb", m, w.astype(m.dtype))
        return out.reshape(c_ch, hw, hw)

    m0 = jnp.asarray(rng.uniform(0.0, 1.0, (b, p_n, c_ch, hd, hd))
                     .astype(np.float32)).astype(dt_state)

    for label, fn, val in [
        ("splat broadcast-reduce (per iter)",
         splat_bcast, qfull),
        ("splat einsum-matmul (per iter)", splat_einsum, qfull),
        ("slice broadcast-reduce (per iter)", slice_bcast, m0),
        ("slice einsum-matmul (per iter)", slice_einsum, m0),
    ]:
        def make(fn=fn, val=val):
            @jax.jit
            def loop(carry):
                def one(v, w):
                    # dependent chain: fold the output sum back into the input
                    def body(i, vv):
                        s = fn(vv, w).sum().astype(vv.dtype)
                        return vv + s * 1e-12
                    return jax.lax.fori_loop(0, args.iters, body, v).sum()
                s = jax.vmap(one)(val + carry.astype(val.dtype) * 1e-9,
                                  wmock).sum()
                return carry + s.astype(jnp.float32) * 1e-12
            return loop
        timed(make, label)

    # numeric agreement of the two formulations (one image)
    za = splat_bcast(np.asarray(qfull[0]), wmock[0])
    zb = splat_einsum(np.asarray(qfull[0]), wmock[0])
    print(f"splat agreement: max|diff| = "
          f"{float(jnp.max(jnp.abs(za.astype(jnp.float32) - zb.astype(jnp.float32)))):.3e}",
          flush=True)

    # upsample-to-label-res unary softmax (the pre-loop cost)
    def comp_unary():
        from depthg_tpu.ops.resize import resize_bilinear

        @jax.jit
        def loop(carry):
            def body(i, c):
                pr = jax.vmap(lambda l1, l2: jnp.concatenate(
                    [jax.nn.softmax(resize_bilinear(l[None], (hw, hw))[0]
                                    .astype(jnp.float32), axis=0)
                     for l in (l1, l2)], axis=0))(lin + c * 1e-9, clu)
                return c + pr.sum().astype(jnp.float32) * 1e-12
            return jax.lax.fori_loop(0, args.iters, body, carry)
        return loop

    timed(comp_unary, "unary upsample+softmax (once per call)")


if __name__ == "__main__":
    main()
