"""Layout/variant sweep of the CRF's cached-kernel matmul — the single
largest cost in the eval-default CRF.

docs/PERFORMANCE.md + scripts/profile_crf.py establish that at the eval
default (ds=8, 4 phases, batch 16) every mean-field iteration's dominant
piece is the batched materialized-kernel matmul: [B, N, N] bf16 kernels
(N = 6400, 82 MB/image, 1.31 GB batched) applied to [B, N, C] distributions
(C = 54). Ten iterations re-read the kernels ~13 GB total; the measured
effective rate is only ~250 GB/s vs the chip's ~800 GB/s HBM — so this one
matmul holds ~35 ms of recoverable eval time. This script times formulation
variants of the SAME contraction so ops/crf.py's `_cached_matmul` can adopt
the fastest:

* v0  baseline: vmap over images of `kmat @ z` (what _batch_apply builds)
* v1  z padded C 54 -> 128 (full MXU lane width; wasted flops, same bytes)
* v2  z.T @ kmat (kernel as RHS; K is symmetric so this equals (K @ z).T)
* v3  f32 kernel (2x the bytes — calibrates whether the read is BW-bound)
* v4  one flat block-diagonal dot_general via reshape [B*N, N] x ... is NOT
      expressible without materializing B x the kernel — skipped; instead:
      explicit lax.map over images (serial, one kernel resident at a time)
* v5  preferred_element_type=f32 accumulation (vs bf16 out)
* v6  int8 kernel x int8 z -> int32 (the CRFConfig.kernel_int8 path)

Usage::

    python scripts/profile_crf_matmul.py [--batch 16] [--n 6400] [--c 54]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n", type=int, default=6400)
    ap.add_argument("--c", type=int, default=54)
    ap.add_argument("--iters", type=int, default=10,
                    help="dependent fori_loop trips (= mean-field iterations)")
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from depthg_tpu.utils.profiling import dispatch_rtt, median_time

    rtt = dispatch_rtt()
    b, n, c = args.batch, args.n, args.c
    kernel_gb = b * n * n * 2 / 1e9
    print(f"devices={jax.devices()} rtt={rtt * 1e3:.1f} ms  "
          f"kernels: [{b},{n},{n}] bf16 = {kernel_gb:.2f} GB", flush=True)

    # generate ON DEVICE: a [B, N, N] host array is 2.6 GB and the tunneled
    # device_put runs ~57 MB/s — shipping it three times costs minutes
    @jax.jit
    def make_data(key):
        kf = jax.random.uniform(key, (b, n, n), jnp.float32)
        z = jax.random.normal(jax.random.fold_in(key, 1), (b, n, c),
                              jnp.float32)
        return (kf.astype(jnp.bfloat16), kf,
                jnp.round(kf * 127).astype(jnp.int8),
                z.astype(jnp.bfloat16))

    k_bf, k_f, k_i8, z0 = make_data(jax.random.PRNGKey(0))

    def timed(step, z_init, label, bytes_per_iter):
        """step: (z, i) -> z of same shape; dependent chain over iters."""
        @jax.jit
        def loop(z):
            def body(i, zz):
                out = step(zz, i)
                # renormalize so the chain can't over/underflow bf16
                s = jnp.maximum(jnp.max(jnp.abs(out)), 1e-20)
                return (out / s).astype(z_init.dtype)
            return jax.lax.fori_loop(0, args.iters, body, z).sum()
        try:
            float(loop(z_init))  # compile + warm
            dt = max(median_time(lambda: float(loop(z_init)), args.repeats)
                     - rtt, 1e-9) / args.iters
            gbps = bytes_per_iter / dt / 1e9
            print(f"{label:52s}: {dt * 1e3:7.2f} ms/iter  "
                  f"({gbps:6.1f} GB/s kernel read)", flush=True)
            return dt
        except Exception as e:
            print(f"{label:52s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return float("nan")

    kb = b * n * n * 2  # bf16 kernel bytes per iteration

    # v0: the current formulation — vmap(kmat @ z)
    timed(lambda z, i: jax.vmap(lambda km, zz: km @ zz)(k_bf, z),
          z0, "v0 vmap(K @ z) bf16 (current)", kb)

    # v0b: einsum batched form (same math, explicit dot_general batch dims)
    timed(lambda z, i: jnp.einsum("bij,bjc->bic", k_bf, z),
          z0, "v0b einsum bij,bjc->bic bf16", kb)

    # v1: pad C to 128 lanes
    zpad = jnp.pad(z0, ((0, 0), (0, 0), (0, 128 - c)))
    dt_pad = timed(lambda z, i: jnp.einsum("bij,bjc->bic", k_bf, z),
                   zpad, "v1 padded C=128 bf16", kb)

    # v2: kernel as RHS — z.T @ K, using symmetry (equals (K @ z).T)
    z_t = jnp.swapaxes(z0, 1, 2)  # [B, C, N]
    timed(lambda z, i: jnp.einsum("bci,bij->bcj", z, k_bf),
          z_t, "v2 z.T @ K bf16 (kernel RHS)", kb)

    # v2b: kernel RHS with padded C
    zt_pad = jnp.pad(z_t, ((0, 0), (0, 128 - c), (0, 0)))
    timed(lambda z, i: jnp.einsum("bci,bij->bcj", z, k_bf),
          zt_pad, "v2b z.T @ K bf16 padded C=128", kb)

    # v3: f32 kernel (2x bytes — pure bandwidth calibration)
    timed(lambda z, i: jax.vmap(lambda km, zz: km @ zz)(
        k_f, z.astype(jnp.float32)).astype(jnp.bfloat16),
        z0, "v3 vmap(K @ z) f32 kernel", 2 * kb)

    # v4: lax.map serial per image (one kernel resident at a time)
    timed(lambda z, i: jax.lax.map(lambda kz: kz[0] @ kz[1], (k_bf, z)),
          z0, "v4 lax.map(K @ z) bf16 serial", kb)

    # v5: f32 accumulation out
    timed(lambda z, i: jax.vmap(
        lambda km, zz: jax.lax.dot(km, zz,
                                   preferred_element_type=jnp.float32))(
        k_bf, z).astype(jnp.bfloat16),
        z0, "v5 vmap dot f32-accum bf16 in", kb)

    # v6: int8 x int8 -> int32 (the CRFConfig.kernel_int8 formulation)
    def int8_step(z, i):
        zmax = jnp.maximum(jnp.max(jnp.abs(z)).astype(jnp.float32), 1e-20)
        z8 = jnp.round(z.astype(jnp.float32) * (127.0 / zmax)).astype(jnp.int8)
        mi = jax.vmap(lambda km, zz: jax.lax.dot(
            km, zz, preferred_element_type=jnp.int32))(k_i8, z8)
        return (mi.astype(jnp.float32) * (zmax / (127.0 * 127.0))
                ).astype(jnp.bfloat16)
    timed(int8_step, z0, "v6 int8 kernel x int8 z -> int32", kb // 2)

    # v7: both probes' channels already share one z (C=54 = 2x27). What if
    # the batch were folded into the columns instead of a batched dim?
    # Can't: each image has its OWN kernel. But a 2-image "channel pack"
    # halves the number of kernel passes IF kernels were shared — they are
    # not. Skipped; placeholder prints the HBM roofline instead.
    print(f"{'roofline: kernel bytes / 800 GB/s':52s}: "
          f"{kb / 800e9 * 1e3:7.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
