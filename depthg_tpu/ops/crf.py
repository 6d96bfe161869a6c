"""Device-resident dense-CRF mean-field inference.

Replaces the reference's host-side ``pydensecrf`` C++ permutohedral lattice
(``src/crf.py:22-45``: 10 mean-field iterations, Gaussian pairwise sxy=1
compat=3 + bilateral sxy=67 srgb=3 compat=4, unary from softmax of
bilinearly-upsampled logits). The reference runs it serially per image on CPU
— the dominant eval cost. Here the whole refinement is a jitted TPU program:

* the Gaussian (smoothness) kernel is **exact**: with features = positions
  only, the kernel matrix is separable, so one mean-field message is two
  banded [H,H]/[W,W] matmuls on the MXU — no lattice approximation at all;
* the bilateral (appearance) kernel is evaluated **densely** in row-blocks:
  for each block of pixels, squared feature distances to all pixels come from
  one [B,5]x[5,N] matmul, exp on the VPU, then the message is a [B,N]x[N,C]
  matmul. Optional spatial downsampling (default 2x) trades O(N^2) for 16x
  less work; sxy=67 makes the bilateral term very smooth spatially, so the
  mIoU impact is small (validated against full-res).
* both kernels use symmetric normalization (K' = D^-1/2 K D^-1/2), the
  pydensecrf default, and include the self term as the lattice approximation
  does.

Exactness note: this computes the *true* dense kernel (modulo optional
downsampling) — the permutohedral lattice itself is an approximation to it,
so parity with pydensecrf is validated at the mIoU level (SURVEY.md §7 step 4).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class CRFConfig:
    # 10 mean-field iterations, like the reference (src/crf.py:19). Probed
    # (r3, fidelity-study scenes, ds=8 jbu4 sf1.8): NOT converged earlier —
    # mIoU still climbs 67.7 -> 68.4 from iter 5 to 10 and the iter-5 argmax
    # is only 99.1% identical to iter-10, so cutting iterations trades
    # quality like any other operating point; it is not a free speedup.
    max_iter: int = 10
    pos_w: float = 3.0       # POS_W
    pos_xy_std: float = 1.0  # POS_XY_STD
    bi_w: float = 4.0        # Bi_W
    bi_xy_std: float = 67.0  # Bi_XY_STD
    bi_rgb_std: float = 3.0  # Bi_RGB_STD
    downsample: int = 2      # spatial reduction for the bilateral N^2 pass
    # row-block size for the bilateral tiles: 800 divides every standard
    # coarse size (320^2/ds^2 for ds in {1,2,4}), so no tile padding
    # (measured ~10% faster than 1024 at ds=4)
    block: int = 800
    # mixed-resolution mode: run the mean field (unary + exact separable
    # Gaussian) at FULL resolution and only the O(N^2) bilateral message at
    # the downsampled resolution (sxy=67 makes it spatially smooth, so the
    # coarse approximation is nearly exact while the sxy=1 Gaussian keeps its
    # full sharpness). False = legacy: everything at the coarse resolution.
    mixed_resolution: bool = True
    # fused Pallas kernel for the bilateral message (ops.crf_pallas). Off by
    # default: measured on v5e, XLA's automatic fusion of the blockwise
    # formulation below is ~3x faster than the hand-written kernel (the
    # compiler already avoids materializing K); see ops/crf_pallas.py.
    use_pallas: bool = False
    # mean-field state dtype. The iteration is HBM-bound at full res;
    # "bfloat16" halves the traffic. The unary stays f32 and each iteration
    # re-softmaxes from it, so bf16 rounding doesn't accumulate.
    dtype: str = "float32"
    # joint-bilateral splat/slice (mixed mode only). 0 = off: the coarse
    # grid carries ds x ds AVERAGED colors, so boundary cells hold mixed
    # colors and the appearance kernel blurs exactly where it matters.
    # P >= 1: the coarse point set is P strided phase grids of PURE pixel
    # colors; each full-res pixel splats into its cell in every phase
    # weighted by color similarity (slice = splat^T, so the effective
    # bilateral operator S^T K S stays symmetric PSD and is normalized by
    # its true full-res degree). Color mismatch attenuates a pixel's
    # message instead of corrupting it — measured on the fidelity scenes
    # (docs/CRF_FIDELITY.md): ds=4 retains 67% of the lattice's mIoU gain
    # with averaged colors vs 93% with splat_phases=2 at ~1/4 the kernel
    # cost of ds=2.
    splat_phases: int = 0
    # widen the splat/slice color Gaussian by this factor: the pixel->cell->
    # cell->pixel composition multiplies three color Gaussians, so unit-sigma
    # splats over-narrow the effective kernel; ~1.4 compensates (measured
    # +0.1-0.3 mIoU on the fidelity scenes, zero runtime cost)
    splat_sigma_factor: float = 1.0
    # materialize the [N, N] bilateral kernel once (exp is the dominant
    # cost — VPU transcendental-bound) and run the 10 mean-field messages
    # as pure MXU matmuls against it, when the per-image kernel fits this
    # budget (MB): 82 MB/image bf16 at downsample=4, 1.25 GB at
    # downsample=2 (the batch wrappers switch vmap -> lax.map when the
    # batched kernels exceed ~3 GB total; 2.6 GB f32 at ds=2 still caches
    # — sequential per-image peak, not batched). downsample=1 (42 GB)
    # streams tiles as before. 0 disables caching entirely.
    kernel_cache_mb: int = 2700
    # store the cached kernel int8 (fixed scale 127: entries are
    # exp(-d^2/2) in (0, 1]) and run each mean-field message as an
    # int8 x int8 -> int32 MXU matmul against a per-call dynamically-scaled
    # int8 copy of the distributions. Quantization error <= 0.5/127 per
    # entry (~the bf16 rounding already accepted by dtype="bfloat16");
    # entries below 1/254 round to zero, truncating the same far tail the
    # reference's permutohedral lattice never represents. MEASURED SLOWER
    # on v5e (scripts/profile_crf.py, eval default batch 16: 17.9 vs
    # 10.6 ms/img): this jaxlib lowers the int8 dot through a conversion
    # path instead of a native int8 MXU pass, so the halved HBM read buys
    # nothing. Stays opt-in for its real remaining value — halving the
    # cache FOOTPRINT so the sharded vmap path keeps caching at twice the
    # per-device batch (_VMAP_KERNEL_BUDGET_BYTES).
    kernel_int8: bool = False
    # coarse-to-fine (splat_phases mode only): run the FIRST this-many
    # mean-field iterations entirely on the coarse phase-point set — unary =
    # phase samples of the full-res log-unary (pure pixels, no averaging),
    # message = the cached [N, N] bilateral matmul, symmetric-normalized by
    # the COARSE kernel degree — then color-slice the coarse Q to full
    # resolution and finish with (max_iter - coarse_prefix) standard
    # full-res iterations. The full-res iterations are HBM/VPU-bound
    # (softmax + Gaussian + splat/slice over [C, H, W] each pass,
    # docs/PERFORMANCE.md) while a coarse iteration is one small MXU matmul,
    # so prefix iterations are ~free. The sxy=1 Gaussian pairwise term is
    # DROPPED during the prefix: nearest inter-point distance at ds=8/P=4 is
    # 4 px, where exp(-d^2/2) ~ 3e-4 — it only shapes the final full-res
    # refinements, exactly the iterations that still run it. 0 = off
    # (quality default until the fidelity study validates a prefix point).
    coarse_prefix: int = 0
    # pyramid schedule (JBU + coarse_prefix mode): run this many mean-field
    # iterations at HALF resolution between the coarse prefix and the
    # full-res tail. The half-res STRIDED image (image[:, ::2, ::2])
    # contains the exact phase pixels whenever every phase offset is even
    # (true for the quincunx at ds=8: offsets {2, 6} and the diagonal at
    # ds=8: {2, 6}), so the mid-res JBU operator's point features are
    # IDENTICAL to the full-res operator's and the cached [N, N] kernel is
    # shared — a mid iteration pays ~1/4 of a full-res iteration's
    # HBM/VPU cost (softmax + Gaussian + splat/slice at 160^2 instead of
    # 320^2) plus the same small kernel matmul, with the sxy=1 Gaussian
    # kept (at sigma/2) unlike the coarse prefix which drops it. 0 = off.
    # Ignored (treated as full-res iterations) when the JBU path is
    # inactive or an odd phase offset makes the strided grid miss the
    # phase pixels.
    mid_prefix: int = 0
    # full-resolution splat/slice formulation (JBU mode): "broadcast" = the
    # r4 cell-blocked broadcast-multiply-reduce; "pool_matmul" = per-phase
    # full-res multiply + ds-block sum-pooling as two [hd, H] indicator
    # matmuls on the MXU (slice = the transpose: block-replicate matmuls,
    # then color-weight and sum over phases). Same math; they differ only
    # in how XLA lays out the reduction (the broadcast form reduces over
    # [..., ds] minor axes, the matmul form stays in [H, W] tiles).
    splat_impl: str = "broadcast"
    # batch strategy for the batched wrappers (``dense_crf_batch`` /
    # ``dense_crf_multi_batch``). "auto" resolves to the vmap family
    # (whole-batch, cache-sized chunks, or streaming — _batch_apply).
    # "map" (one image at a time via lax.map) is EXPLICIT OPT-IN only: on
    # v5e 'kernel fault's make it unusable near this workload — the r4
    # bisect showed the composed program (ViT flip-TTA + probes + lax.map
    # over the cached-kernel coarse-prefix mean field) deterministically
    # crashes the worker (scripts/bisect_compose.py: FAILS with cache +
    # coarse_prefix in {1, 3} + remaining full-res iterations, f32/bf16/
    # int8 alike; PASSES with cache off, prefix 0, prefix = max_iter, or
    # vmap), and r5's UNROLLED grid iterations fault under lax.map even
    # STANDALONE. With the rolled loop (max_iter > _MAX_UNROLLED_GRID_
    # ITERS) map was the fastest standalone shape on one device; it is a
    # scan, so it can never span a sharded batch axis.
    batch_strategy: str = "auto"


# Named eval OPERATING POINTS: sets of run-config overrides expanding to a
# validated row of docs/CRF_FIDELITY.md. One registry shared by the eval CLI
# (``operating_point=<name>``), bench.py (measures every point each run) and
# scripts/check_parity.py (check 2 accepts ``operating_point=`` so the
# parity story tracks whichever point the CLI promotes).
EVAL_OPERATING_POINTS = {
    # the eval CLI default — whatever crf_config_from_cfg({}) resolves to
    # (r5: ds=8 jbu4 sf1.8 cp5 m4 f1 pm-int8, ~89% of the lattice gain)
    "default": {},
    # ~94% of the lattice gain at ~2x the default's cost (ds=4 jbu2 sf1.41)
    "quality_plus": {"crf_downsample": 4},
    # ~85% of the gain, 8 coarse-prefix iterations (fidelity row cp8) —
    # documented BELOW the >=88% retention bar; explicit opt-in only
    "fast": {"crf_coarse_prefix": 8},
    # crash-chain fallback: phase-free classic downsample-4 CRF (the
    # r2-measured configuration; also forces the XLA attention path in
    # bench.py's fallback arm)
    "safe": {"crf_downsample": 4, "crf_splat_phases": 0},
}


def operating_point_overrides(name: str) -> list:
    """A named operating point as ``k=v`` config-override strings. Callers
    apply these BEFORE the user's own overrides, so the point beats the YAML
    defaults but an explicit ``crf_*=`` on the command line beats the point."""
    return [f"{k}={v}" for k, v in EVAL_OPERATING_POINTS[name].items()]


def crf_config_from_cfg(cfg) -> CRFConfig:
    """CRF operating point from run-config keys. Defaults = the quality/speed
    point validated in docs/CRF_FIDELITY.md (downsample=8 with 4-phase
    joint-bilateral splat/slice, widened splat sigma, bf16 state, pyramid
    schedule cp5 m4 f1 — 5 coarse-point iterations, 4 half-res, 1 full-res
    — pool-matmul splat/slice + int8 kernel cache; retains ~89% of the
    permutohedral lattice's mIoU gain): the eval CLI default AND the
    bench.py headline — one operating point, one story. The quality+ point
    (94% of the gain, much slower): ``crf_downsample=4`` (its
    per-downsample defaults follow the table). Quality-leaning:
    ``crf_coarse_prefix=3`` (cp3 m4 f3, 90%). Below-bar fast point:
    ``crf_coarse_prefix=8`` (85%).

    Phase/sigma defaults track the chosen downsample so an explicit
    ``crf_downsample=2`` keeps its classic (phase-free) cost instead of
    silently quadrupling its point set."""
    ds = int(cfg.get("crf_downsample", 8))
    phases = int(cfg.get("crf_splat_phases", {8: 4, 4: 2}.get(ds, 0)))
    return CRFConfig(
        downsample=ds,
        splat_phases=phases,
        splat_sigma_factor=float(cfg.get("crf_splat_sigma",
                                         {8: 1.8, 4: 1.41}.get(ds, 1.0))),
        dtype=str(cfg.get("crf_dtype", "bfloat16")),
        mixed_resolution=bool(cfg.get("crf_mixed_resolution", True)),
        # r5 defaults at the JBU point: pool-matmul splat/slice + int8
        # kernel cache — same operator math, measured 9.58 -> 6.81 ms/img
        # vmapped at cp3 (scripts/profile_crf.py r5), quality re-validated
        # in docs/CRF_FIDELITY.md ("pm-int8" rows)
        splat_impl=str(cfg.get("crf_splat_impl",
                               "pool_matmul" if phases else "broadcast")),
        kernel_int8=bool(cfg.get("crf_kernel_int8", bool(phases))),
        # coarse-prefix default keyed to the ONE fidelity-validated point
        # (ds=8, 4 phases — docs/CRF_FIDELITY.md): the prefix's
        # drop-the-Gaussian justification needs >= 4 px between coarse
        # points (exp(-d^2/2) ~ 3e-4); at ds=4/P=2 the spacing is ~2.8 px
        # (exp ~ 0.018) and the approximation is unvalidated, so explicit
        # finer downsamples keep prefix 0 unless overridden. Default 5
        # since r5 (was 3): the cp5 pm-int8 row retains 89% of the lattice
        # gain (vs cp3's 90%) and is the point that clears the >=120 img/s
        # composed-eval bar; crf_coarse_prefix=3 restores the r4 default.
        coarse_prefix=(cp := int(cfg.get("crf_coarse_prefix",
                                         5 if (ds == 8 and phases == 4)
                                         else 0))),
        # pyramid schedule (CRFConfig.mid_prefix): 4 half-res iterations
        # between the coarse prefix and the full-res tail, defaulted ONLY
        # at the fidelity-validated points — ds=8/4-phase with cp 5 (the
        # eval default: cp5 m4 f1, 89% of the lattice gain at ~2/3 the
        # cp5-only cost) or cp 3 (cp3 m4 f3, 90%). Other schedules are
        # explicit opt-in (crf_mid_prefix=N).
        mid_prefix=int(cfg.get("crf_mid_prefix",
                               4 if (ds == 8 and phases == 4
                                     and cp in (3, 5)) else 0)),
    )


@functools.lru_cache(maxsize=None)
def _pool_matrix(n: int, ds: int) -> np.ndarray:
    """[n // ds, n] 0/1 block-sum indicator (ds-cell pooling as a matmul)."""
    m = np.zeros((n // ds, n), np.float32)
    for i in range(n // ds):
        m[i, i * ds:(i + 1) * ds] = 1.0
    return m


@functools.lru_cache(maxsize=None)
def _gauss_band(n: int, sigma: float) -> np.ndarray:
    """Dense [n, n] 1-D Gaussian kernel matrix exp(-(i-j)^2 / 2 sigma^2)."""
    idx = np.arange(n, dtype=np.float64)
    d = idx[:, None] - idx[None, :]
    return np.exp(-(d * d) / (2.0 * sigma * sigma)).astype(np.float32)


def _gaussian_filter(q: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Exact separable Gaussian kernel application; q: [C, H, W].

    Two dense banded matmuls on the MXU. The kernel support is only ~11
    taps at sigma=1, so this looks wasteful, but both cheaper formulations
    LOSE on v5e (measured): a depthwise 11-tap conv is 20x fewer FLOPs yet
    35% slower end-to-end (single-channel convs can't feed the MXU), and
    band-blocked [blk, blk+2r] matmuls (4x fewer FLOPs at blk=80) are ~25%
    slower (tiles below the 128x128 MXU shape waste the systolic array,
    and the overlapping-slab gather adds HBM traffic). Dense [n, n] at
    n=320 keeps the MXU saturated.
    """
    h, w = q.shape[-2:]
    gh = jnp.asarray(_gauss_band(h, sigma), q.dtype)
    gw = jnp.asarray(_gauss_band(w, sigma), q.dtype)
    q = jnp.einsum("ij,cjw->ciw", gh, q)
    return jnp.einsum("ij,cwj->cwi", gw, q)


def _bilateral_message(feats: jnp.ndarray, values: jnp.ndarray, block: int,
                       use_pallas: bool = False) -> jnp.ndarray:
    """K @ values with k_ij = exp(-||f_i - f_j||^2 / 2), blockwise + symmetric.

    feats: [N, F] (already divided by their sigmas), values: [N, C].

    The kernel is symmetric, so each off-diagonal [block, block] tile is
    computed ONCE and applied both ways (K tile to the row blocks, its
    transpose to the column blocks) — ~2x fewer exp evaluations, which
    dominate the cost (the mean field is VPU-transcendental-bound, measured
    v5e). Tiles are batched per block-diagonal so each offset is one vmapped
    exp + two batched matmuls on the MXU.
    """
    if use_pallas:
        from depthg_tpu.ops.crf_pallas import bilateral_message_pallas, pallas_supported

        if pallas_supported(feats.shape[0], values.shape[1]):
            return bilateral_message_pallas(feats, values)
    n, f = feats.shape
    c = values.shape[1]
    fb, sqb, nb = _block_features(feats, block)
    values_p = jnp.pad(values, ((0, (-n) % block), (0, 0)))
    vb = values_p.reshape(nb, block, c)

    if nb > _MAX_UNROLLED_DIAGS:
        # huge N (downsample<=1): the symmetric-diagonal structure would
        # unroll nb stages into the jaxpr (128 at ds=1/320px) — keep one
        # rolled lax.map over row blocks instead (2x the exp count, but a
        # bounded program; this config cannot cache its kernel either)
        def row_block(fb_sq):
            fbi, sqi = fb_sq
            k = _kernel_tile(fbi, sqi, feats, jnp.sum(feats * feats, axis=1),
                             values.dtype)
            return k @ values
        out = jax.lax.map(row_block, (fb, sqb))
        return out.reshape(-1, c)[:n]

    out = jnp.zeros((nb, block, c), values.dtype)
    for d in range(nb):
        m = nb - d
        k = jax.vmap(lambda a, s, bj, sj: _kernel_tile(a, s, bj, sj, values.dtype))(
            fb[:m], sqb[:m], fb[d:], sqb[d:])  # [m, B, B]
        out = out.at[:m].add(jnp.einsum("mij,mjc->mic", k, vb[d:]))
        if d:
            out = out.at[d:].add(jnp.einsum("mij,mic->mjc", k, vb[:m]))
    return out.reshape(-1, c)[:n]


# above this many block-diagonals the symmetric unrolled formulation is
# traded for a rolled lax.map (jaxpr size over exp savings)
_MAX_UNROLLED_DIAGS = 48

# grid-resolution mean-field iterations are unrolled up to this count (the
# reference's max_iter is 10); beyond it a rolled fori_loop bounds program
# size. See run_iters in dense_crf_multi for the measured loop tax.
_MAX_UNROLLED_GRID_ITERS = 12


def _block_features(feats: jnp.ndarray, block: int):
    """Pad + reshape features/sq-norms into [nb, block, ...] tiles.

    Padded rows get sq = +inf so their kernel entries are exp(-inf) = 0 in
    BOTH directions — they contribute nothing to any message.
    """
    n, f = feats.shape
    pad = (-n) % block
    feats_p = jnp.pad(feats, ((0, pad), (0, 0)))
    sq = jnp.sum(feats * feats, axis=1)
    sq_p = jnp.pad(sq, (0, pad), constant_values=jnp.inf)
    nb = feats_p.shape[0] // block
    return feats_p.reshape(nb, block, f), sq_p.reshape(nb, block), nb


def _kernel_tile(fa, sa, fbj, sbj, dtype):
    """One [blk_a, blk_b] kernel tile exp(-||f_i - f_j||^2 / 2).

    -||a-b||^2/2 = a.b - |a|^2/2 - |b|^2/2. The cross term is O(1e3)
    (rgb/3 ~ 80 squared, summed over 5 features) while logk needs ~0.1
    absolute accuracy — the MXU's default bf16-input passes lose ~e^±3 of
    kernel mass here (silent on CPU tests, wrong on TPU; see
    docs/CRF_FIDELITY.md "History"). Force full f32: the [B,5]x[5,B] matmul
    is depth-5, so HIGHEST costs nothing next to exp and the value matmuls.
    The tile is returned in the values' dtype: it is the largest
    intermediate and its entries live in [0, 1] — bf16-safe.
    """
    cross = jax.lax.dot_general(
        fa, fbj.T, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    logk = cross - 0.5 * sa[:, None] - 0.5 * sbj[None, :]
    return jnp.exp(logk).astype(dtype)


def _bilateral_kernel(feats: jnp.ndarray, block: int, dtype) -> jnp.ndarray:
    """Materialized [N, N] kernel k_ij = exp(-||f_i - f_j||^2 / 2).

    With the kernel resident, every mean-field message is one
    [N, N] x [N, C] MXU matmul — the exp cost (the VPU-bound dominant term)
    is paid once instead of once per message (10 iterations + degree),
    measured ~2.5x faster at downsample=4 on v5e.

    Built as vmapped ROW-BLOCK tiles (each off-diagonal entry exp'd twice):
    an earlier version reused the streaming path's symmetric trick — exp
    each [blk, blk] tile once, scatter it to (i, j) and its transpose to
    (j, i) — but the 15 sequential ``.at[].set`` scatters on the [N, N]
    buffer cost far more than the saved transcendentals (measured v5e,
    eval default ds=8/4-phase batch 16: build 18.4 -> 4.5 ms/batch; the
    VPU does 2x the exps in ~0.7 ms while the scatters rewrote the 1.3 GB
    batched kernel repeatedly). K is symmetric to ~2e-8 (measured on v5e:
    the HIGHEST-precision f32 dot is emulated by bf16 MXU passes whose
    cross-term accumulation order differs between the LHS and RHS roles,
    so k_ij and k_ji round the same a.b one ulp apart) — well below the
    bf16 cast the kernel entries get next, and mean field needs no exact
    symmetry. The f32 log-kernel transient is bounded to one [block, N]
    slab per vmap lane (exp + cast fuse into the tile computation)."""
    n, _ = feats.shape
    fb, sqb, nb = _block_features(feats, block)
    feats_p = fb.reshape(nb * block, -1)
    sq_p = sqb.reshape(nb * block)

    k = jax.vmap(lambda a, s: _kernel_tile(a, s, feats_p, sq_p, dtype))(
        fb, sqb)  # [nb, block, Np]
    return k.reshape(nb * block, nb * block)[:n, :n]


def _phase_offsets(p: int, ds: int) -> list:
    """Representative-pixel offsets of the P splat phase grids in a ds x ds
    cell: diagonal for P=2, quincunx for P=4."""
    if p <= 0 or ds <= 1:
        return []
    a, b, c = ds // 4, (3 * ds) // 4, ds // 2
    if p == 1:
        return [(c, c)]
    if p == 2:
        return [(a, a), (b, b)]
    if p == 4:
        return [(a, a), (a, b), (b, a), (b, b)]
    raise ValueError(f"splat_phases must be 0, 1, 2 or 4; got {p}")


def _jbu_phases(ccfg: CRFConfig, h: int, w: int) -> list:
    """Phase grids of the joint-bilateral splat/slice path at resolution
    (h, w), or [] when the path is inactive (non-mixed mode, ds <= 1,
    splat_phases = 0, or an odd resolution — the phase grids need exact
    ds x ds cells, so those images take the resize-based mixed path). The
    ONE definition of the JBU activation predicate: ``dense_crf_multi``
    picks its message operator with it and ``_batch_apply`` sizes the
    kernel cache with it — a second copy would silently desynchronize the
    cache estimate from the actual point set."""
    ds = ccfg.downsample
    if not (ccfg.mixed_resolution and ds > 1 and h % ds == 0 and w % ds == 0):
        return []
    return _phase_offsets(ccfg.splat_phases, ds)


def _jbu_operator(image: jnp.ndarray, ccfg: CRFConfig, ds: int, dt, phases,
                  kmat=None, want_coarse: bool | None = None):
    """Joint-bilateral splat/slice operator A = S^T K S (see CRFConfig.
    splat_phases). Returns (apply_A, deg, coarse, kmat): deg = A @ 1 at the
    operator's own ("full") resolution, and apply_A: [C, H, W] ->
    [C, H, W] computes the symmetrically NORMALIZED message
    D^{-1/2} A D^{-1/2} q — the rsqrt degree is folded into the splat
    weights once at build time (S = pool o diag(wgt), so scaling wgt
    scales both the S and S^T applications), saving two full-resolution
    multiplies per mean-field iteration.

    ``kmat``: a prebuilt cached kernel to share instead of building one —
    the pyramid schedule's mid-res operator has IDENTICAL point features
    (CRFConfig.mid_prefix), so its kernel is the same matrix. ``want_coarse``
    overrides the ``ccfg.coarse_prefix > 0`` default for whether the
    coarse-iteration tools (message + slice at this operator's resolution)
    are built."""
    h, w = image.shape[-2:]
    hd, wd = h // ds, w // ds
    nc = hd * wd
    p = len(phases)
    rgb_full = image.astype(jnp.float32) / ccfg.bi_rgb_std

    feats_list, wgt_list = [], []
    for oy, ox in phases:
        img_p = image[:, oy::ds, ox::ds].astype(jnp.float32)
        ys = (jnp.arange(hd, dtype=jnp.float32) * ds + oy) / ccfg.bi_xy_std
        xs = (jnp.arange(wd, dtype=jnp.float32) * ds + ox) / ccfg.bi_xy_std
        yy = jnp.broadcast_to(ys[:, None], (hd, wd))
        xx = jnp.broadcast_to(xs[None, :], (hd, wd))
        f = jnp.concatenate([xx[None], yy[None], img_p / ccfg.bi_rgb_std], axis=0)
        feats_list.append(f.reshape(5, -1).T)
        cell_up = jnp.repeat(jnp.repeat(img_p / ccfg.bi_rgb_std, ds, -2), ds, -1)
        wgt_list.append(jnp.exp(-0.5 * jnp.sum((rgb_full - cell_up) ** 2, axis=0)
                                / ccfg.splat_sigma_factor ** 2))

    bf = jnp.concatenate(feats_list, axis=0)  # [P * nc, 5]
    n_pts = p * nc
    cache = (kmat is not None
             or _kernel_cache_bytes(n_pts, ccfg) is not None)
    if cache and kmat is None:
        kmat = _cache_kernel(bf, ccfg, dt)

    # cell-blocked splat weights [P, hd, ds, wd, ds]: each transfer
    # direction is ONE fused broadcast-multiply-reduce over the phase/cell
    # axes instead of P sequential full-resolution read-modify-write passes
    # (the mean field is HBM-bound at full res; measured on v5e at ds=8 P=4
    # batch 16: 9.8 -> see docs/PERFORMANCE.md)
    wgt_c = jnp.stack(wgt_list).reshape(p, hd, ds, wd, ds)

    def make_apply(wc):
        def message(z):
            """[n_pts, C] -> bilateral kernel message in the cache dtype."""
            return (_cached_matmul(kmat, z, dt) if cache
                    else _bilateral_message(bf, z, ccfg.block, ccfg.use_pallas))

        def apply_broadcast(q):
            # dtype-following: messages run in the mean-field state dtype
            # (bf16 halves the full-res HBM traffic); the one-time degree
            # call passes f32 ones
            c = q.shape[0]
            qc = q.reshape(c, hd, ds, wd, ds)
            wq = wc.astype(q.dtype)
            # splat: z[p,c,i,j] = sum_{a,b} q[c,i,a,j,b] * wgt[p,i,a,j,b]
            z = jnp.sum(qc[None] * wq[:, None], axis=(3, 5))  # [P, C, hd, wd]
            z = jnp.moveaxis(z.reshape(p, c, nc), 1, 2).reshape(n_pts, c).astype(dt)
            mc = message(z)
            m = jnp.moveaxis(mc.reshape(p, nc, c), 2, 1).reshape(p, c, hd, wd)
            # slice: out[c,i,a,j,b] = sum_p m[p,c,i,j] * wgt[p,i,a,j,b]
            out = jnp.sum(m[:, :, :, None, :, None].astype(q.dtype)
                          * wq[:, None], axis=0)
            return out.reshape(c, h, w)

        def apply_pool_matmul(q):
            # CRFConfig.splat_impl = "pool_matmul": same operator expressed
            # as full-resolution multiplies + ds-block pooling MATMULS, so
            # the reductions run as [hd, H] x [H, W] MXU tiles instead of a
            # VPU reduce over [..., ds] minor axes
            c = q.shape[0]
            wq = wc.reshape(p, h, w).astype(q.dtype)
            ph = jnp.asarray(_pool_matrix(h, ds), q.dtype)  # [hd, H]
            pw = jnp.asarray(_pool_matrix(w, ds), q.dtype)  # [wd, W]
            zs = []
            for pi in range(p):
                t = jnp.einsum("IH,cHW->cIW", ph, q * wq[pi][None])
                zs.append(jnp.einsum("cIW,WJ->cIJ", t, pw.T))
            z = jnp.stack(zs)  # [P, C, hd, wd]
            z = jnp.moveaxis(z.reshape(p, c, nc), 1, 2).reshape(n_pts, c).astype(dt)
            mc = message(z)
            m = jnp.moveaxis(mc.reshape(p, nc, c), 2, 1).reshape(p, c, hd, wd)
            m = m.astype(q.dtype)
            out = None
            for pi in range(p):
                u = jnp.einsum("HI,cIJ->cHJ", ph.T, m[pi])
                u = jnp.einsum("cHJ,JW->cHW", u, pw) * wq[pi][None]
                out = u if out is None else out + u
            return out

        return (apply_pool_matmul if ccfg.splat_impl == "pool_matmul"
                else apply_broadcast)

    deg = make_apply(wgt_c)(jnp.ones((1, h, w), jnp.float32))[0]
    isd = jax.lax.rsqrt(jnp.maximum(deg, 1e-20))
    wgt_norm = wgt_c * isd.reshape(hd, ds, wd, ds)[None]

    coarse = None
    if ccfg.coarse_prefix > 0 if want_coarse is None else want_coarse:
        # tools for the coarse-prefix iterations (CRFConfig.coarse_prefix):
        # message on the phase-point set itself, normalized by the COARSE
        # kernel degree (the full-res degree lives in the splat weights and
        # never sees a coarse-only iteration), and the color-weighted slice
        # back to full resolution for the hand-off. Point order everywhere
        # is phase-major (matches bf / apply_a's z).
        ones_c = jnp.ones((n_pts, 1), jnp.float32)
        deg_c = (_cached_matmul(kmat, ones_c.astype(dt), dt) if cache
                 else _bilateral_message(bf, ones_c, ccfg.block,
                                         ccfg.use_pallas))[:, 0]
        isd_c = jax.lax.rsqrt(jnp.maximum(deg_c.astype(jnp.float32), 1e-20))

        def coarse_message(qc):
            """[C, n_pts] -> D^{-1/2} K D^{-1/2} qc, f32."""
            z = (qc.astype(jnp.float32) * isd_c[None]).T.astype(dt)
            mc = (_cached_matmul(kmat, z, dt) if cache
                  else _bilateral_message(bf, z, ccfg.block, ccfg.use_pallas))
            return mc.T.astype(jnp.float32) * isd_c[None]

        def slice_full(mc):
            """Color-weighted slice [C, n_pts] -> [C, H, W]. Per-pixel scale
            is arbitrary (the caller renormalizes over classes)."""
            c = mc.shape[0]
            m = jnp.moveaxis(mc.reshape(c, p, nc), 1, 0).reshape(p, c, hd, wd)
            out = jnp.sum(m[:, :, :, None, :, None] * wgt_c[:, None], axis=0)
            return out.reshape(c, h, w)

        coarse = (coarse_message, slice_full)
    return make_apply(wgt_norm), deg, coarse, kmat


def _bilateral_features(image: jnp.ndarray, ccfg: CRFConfig, ds: int) -> jnp.ndarray:
    """[N, 5] features (x, y, r, g, b) scaled by their stds; image: [3, H, W] 0..255."""
    h, w = image.shape[-2:]
    ys = (jnp.arange(h, dtype=jnp.float32) * ds + (ds - 1) / 2.0) / ccfg.bi_xy_std
    xs = (jnp.arange(w, dtype=jnp.float32) * ds + (ds - 1) / 2.0) / ccfg.bi_xy_std
    yy = jnp.broadcast_to(ys[:, None], (h, w))
    xx = jnp.broadcast_to(xs[None, :], (h, w))
    rgb = image / ccfg.bi_rgb_std
    feats = jnp.concatenate([xx[None], yy[None], rgb], axis=0)  # [5, H, W]
    return feats.reshape(5, -1).T


def dense_crf_multi(image: jnp.ndarray, logits_list, ccfg: CRFConfig = CRFConfig()):
    """Mean-field dense CRF refinement of SEVERAL label fields over one image.

    The pairwise kernels depend only on the image, so refining k independent
    logit sets (the eval path runs linear + cluster probes over the same
    image, ``src/eval_segmentation.py:158-167``) shares the expensive part:
    the per-iteration bilateral message stacks all fields' distributions into
    one [N, sum(C_k)] value matrix, computing the O(N^2) kernel (the exp is
    the dominant cost on the VPU) exactly once.

    image: [3, H, W] raw pixel values 0..255; each logits: [C_k, h, w].
    Returns a list of refined Q: [C_k, H, W].
    """
    cs = [lg.shape[0] for lg in logits_list]
    splits = list(np.cumsum(cs))[:-1]
    h, w = image.shape[-2:]
    probs = jnp.concatenate(
        [jax.nn.softmax(resize_bilinear(lg[None], (h, w))[0].astype(jnp.float32), axis=0)
         for lg in logits_list], axis=0)  # [sum(C), H, W]

    ds = ccfg.downsample
    mixed = ccfg.mixed_resolution and ds > 1
    hd, wd = (h // ds, w // ds) if ds > 1 else (h, w)
    dt = jnp.bfloat16 if ccfg.dtype == "bfloat16" else jnp.float32

    phases = _jbu_phases(ccfg, h, w)
    cp = mp = 0
    if phases:
        # iteration schedule (CRFConfig.coarse_prefix / mid_prefix): cp
        # coarse point-set iterations, then mp half-res iterations, then
        # (max_iter - cp - mp) full-res iterations
        cp = min(max(int(ccfg.coarse_prefix), 0), ccfg.max_iter)
        mid_ok = ds % 2 == 0 and all(oy % 2 == 0 and ox % 2 == 0
                                     for oy, ox in phases)
        mp = (min(max(int(ccfg.mid_prefix), 0), ccfg.max_iter - cp)
              if mid_ok else 0)
        # joint-bilateral splat/slice: pure-color phase grids, color-weighted
        # transfer operator, full-resolution degree (CRFConfig.splat_phases);
        # the operator returns the D^{-1/2} A D^{-1/2}-normalized message
        jbu_apply, _, jbu_coarse, kmat = _jbu_operator(
            image, ccfg, ds, dt, phases, want_coarse=(cp > 0 and mp == 0))
        if mp:
            # half-res operator over the STRIDED image: every phase offset
            # is even, so its point set is the same pure pixels and the
            # cached kernel is shared verbatim (CRFConfig.mid_prefix).
            # Halving bi_xy_std makes the mid-grid position features equal
            # the full-res ones exactly: (i*ds/2 + oy/2) / (std/2)
            # == (i*ds + oy) / std.
            image_mid = image[:, ::2, ::2]
            ccfg_mid = dataclasses.replace(ccfg, bi_xy_std=ccfg.bi_xy_std / 2)
            phases_mid = [(oy // 2, ox // 2) for oy, ox in phases]
            jbu_apply_mid, _, jbu_coarse_mid, _ = _jbu_operator(
                image_mid, ccfg_mid, ds // 2, dt, phases_mid, kmat=kmat,
                want_coarse=(cp > 0))
            if cp:
                jbu_coarse = jbu_coarse_mid  # coarse hands off at mid res
    else:
        if ds > 1:
            image_d = resize_bilinear(image[None].astype(jnp.float32), (hd, wd))[0]
        else:
            image_d = image.astype(jnp.float32)

        # bilateral (appearance) kernel state at the coarse working resolution
        bf = _bilateral_features(image_d, ccfg, ds)
        n_coarse = hd * wd
        cache_kernel = _kernel_cache_bytes(n_coarse, ccfg) is not None
        if cache_kernel:
            kmat = _cache_kernel(bf, ccfg, dt)
            deg_bi = _cached_matmul(kmat, jnp.ones((n_coarse, 1), dt),
                                    dt)[:, 0].astype(jnp.float32)
        else:
            ones = jnp.ones((n_coarse, 1), jnp.float32)
            deg_bi = _bilateral_message(bf, ones, ccfg.block, ccfg.use_pallas)[:, 0]
        inv_sqrt_deg_bi = jax.lax.rsqrt(jnp.maximum(deg_bi, 1e-20))

        def bilateral(q_coarse):
            c = q_coarse.shape[0]
            z = (q_coarse.reshape(c, -1) * inv_sqrt_deg_bi[None].astype(dt)).T  # [Nc, C]
            mb = _cached_matmul(kmat, z, dt).T if cache_kernel else \
                _bilateral_message(bf, z, ccfg.block, ccfg.use_pallas).T
            return (mb * inv_sqrt_deg_bi[None].astype(dt)).reshape(c, hd, wd)

    def blockwise_softmax(x):
        """Softmax per logit set along the stacked channel axis (f32 math —
        the unary keeps full precision so bf16 rounding never accumulates)."""
        parts = jnp.split(x, splits, axis=0)
        return jnp.concatenate(
            [jax.nn.softmax(p.astype(jnp.float32), axis=0) for p in parts],
            axis=0).astype(dt)

    if mixed:
        # full-res mean field: exact separable Gaussian + upsampled bilateral
        log_unary = jnp.log(jnp.maximum(probs, 1e-20))

        def grid_iter(lu, sigma, apply_bilateral):
            """One mean-field iteration at lu's grid resolution: exact
            separable Gaussian (symmetrically normalized) + the given
            bilateral message operator."""
            hw_ = lu.shape[-2:]
            deg_g = _gaussian_filter(jnp.ones((1, *hw_), jnp.float32),
                                     sigma)[0]
            isd = jax.lax.rsqrt(jnp.maximum(deg_g, 1e-20))[None].astype(dt)

            def mf_iter(_, q):
                mg = _gaussian_filter(q * isd, sigma) * isd
                mb = apply_bilateral(q)
                return blockwise_softmax(
                    lu + ccfg.pos_w * mg.astype(jnp.float32)
                    + ccfg.bi_w * mb.astype(jnp.float32))
            return mf_iter

        if phases:
            bilateral_full = jbu_apply  # normalization in the splat weights
        else:
            def bilateral_full(q):
                # fast (native-dtype, default-precision) resizes: q lives in
                # [0, 1] and each iteration re-softmaxes from the f32 unary,
                # so per-iteration rounding cannot accumulate
                # (docs/CRF_FIDELITY.md)
                q_coarse = resize_bilinear(q[None], (hd, wd), fast=True)[0]
                return resize_bilinear(bilateral(q_coarse)[None], (h, w),
                                       fast=True)[0]

        if cp:
            # coarse-prefix iterations (CRFConfig.coarse_prefix): state lives
            # on the phase-point set; the unary is the pure-pixel phase
            # samples of the full-res log-unary (strided gather — phases are
            # exact pixel subsets, nothing is averaged)
            cmsg, slice_q = jbu_coarse  # slices to mid res when mp > 0
            cch = log_unary.shape[0]
            lu_c = jnp.concatenate(
                [log_unary[:, oy::ds, ox::ds].reshape(cch, -1)
                 for oy, ox in phases], axis=1)  # [C, n_pts] phase-major

            def cf_iter(qc):
                return blockwise_softmax(lu_c + ccfg.bi_w * cmsg(qc))

            # UNROLLED (python loop, cp <= max_iter = 10 tiny MXU matmuls):
            # the composed-eval program is only TPU-validated in exactly
            # this form. Unrolling ALONE does not fix the r3 worker crash
            # (lax.map batching still faults — bisect round 2); vmap
            # batching with a rolled fori_loop here compiled >15 min on
            # v5e (timeout) where unroll+vmap compiles and runs. Keep the
            # prefix unrolled and the batch strategy "vmap" for composed
            # programs (see CRFConfig.batch_strategy).
            qc = blockwise_softmax(lu_c)
            for _ in range(cp):
                qc = cf_iter(qc)
            # hand-off: color-slice coarse Q to the next grid (mid res when
            # the pyramid schedule is active, else full res), renormalize
            # each logit set over classes (the slice's per-pixel scale
            # cancels)
            sliced = jnp.split(slice_q(qc.astype(jnp.float32)), splits, 0)
            q = jnp.concatenate(
                [s / jnp.maximum(s.sum(axis=0, keepdims=True), 1e-20)
                 for s in sliced], axis=0).astype(dt)
        else:
            # strided mid start == softmax of the strided log-unary: the
            # phase pixels are pure samples, nothing is averaged
            q = (probs[:, ::2, ::2] if mp else probs).astype(dt)

        def run_iters(q, n, mf_iter):
            # UNROLLED python loop up to _MAX_UNROLLED_GRID_ITERS (the
            # reference's max_iter is 10, so in practice always): measured
            # on v5e, a rolled fori_loop here costs a large fixed "loop
            # tax" — the [C, H, W] carried state materializes at every trip
            # boundary and fusion across iterations is blocked (a cp9
            # program whose single full-res iteration XLA canonicalizes out
            # of the 1-trip loop ran 36 ms/batch vs 69 ms for cp8's 2-trip
            # loop). The coarse prefix was already unrolled for the same
            # reason plus the composed-eval crash validation.
            if n <= _MAX_UNROLLED_GRID_ITERS:
                for i in range(n):
                    q = mf_iter(i, q)
                return q
            return jax.lax.fori_loop(0, n, mf_iter, q)

        if mp:
            # half-res iterations (CRFConfig.mid_prefix): same mean field at
            # the strided grid — Gaussian at sigma/2, shared-kernel JBU
            lu_mid = log_unary[:, ::2, ::2]
            q = run_iters(q, mp,
                          grid_iter(lu_mid, ccfg.pos_xy_std / 2,
                                    jbu_apply_mid))
            # bilinear taps sum to 1, so per-pixel class sums stay exactly 1
            q = resize_bilinear(q[None], (h, w), fast=True)[0]
        fi = ccfg.max_iter - cp - mp
        if fi:
            q = run_iters(q, fi,
                          grid_iter(log_unary, ccfg.pos_xy_std,
                                    bilateral_full))
        return jnp.split(q.astype(jnp.float32), splits, axis=0)

    # legacy: entire mean field at the working resolution
    probs_d = resize_bilinear(probs[None], (hd, wd))[0] if ds > 1 else probs
    log_unary = jnp.log(jnp.maximum(probs_d, 1e-20))
    gauss_sigma = ccfg.pos_xy_std / ds
    deg_g = _gaussian_filter(jnp.ones((1, hd, wd), jnp.float32), gauss_sigma)[0]
    inv_sqrt_deg_g = jax.lax.rsqrt(jnp.maximum(deg_g, 1e-20))

    isd = inv_sqrt_deg_g[None].astype(dt)

    def mf_iter(_, q):
        mg = _gaussian_filter(q * isd, gauss_sigma) * isd
        mb = bilateral(q)
        return blockwise_softmax(log_unary + ccfg.pos_w * mg.astype(jnp.float32)
                                 + ccfg.bi_w * mb.astype(jnp.float32))

    q = jax.lax.fori_loop(0, ccfg.max_iter, mf_iter, probs_d.astype(dt)
                          ).astype(jnp.float32)

    if ds > 1:
        q = resize_bilinear(q[None], (h, w))[0]
        parts = jnp.split(q, splits, axis=0)
        return [p / jnp.maximum(p.sum(axis=0, keepdims=True), 1e-20) for p in parts]
    return jnp.split(q, splits, axis=0)


def _kernel_cache_bytes(n_coarse: int, ccfg: CRFConfig) -> int | None:
    """Per-image bytes of a materialized kernel, or None if caching is off."""
    itemsize = 1 if ccfg.kernel_int8 else 2 if ccfg.dtype == "bfloat16" else 4
    nbytes = n_coarse * n_coarse * itemsize
    if ccfg.kernel_cache_mb > 0 and not ccfg.use_pallas \
            and nbytes <= ccfg.kernel_cache_mb * 2**20:
        return nbytes
    return None


def _cache_kernel(bf: jnp.ndarray, ccfg: CRFConfig, dt) -> jnp.ndarray:
    """Materialize the bilateral kernel in its cache storage dtype."""
    if not ccfg.kernel_int8:
        return _bilateral_kernel(bf, ccfg.block, dt)
    # build in f32, then quantize with the FIXED scale 127 (entries live in
    # (0, 1], diagonal exactly 1 -> 127); int32 accumulation is exact up to
    # n = 2^31 / 127^2 ~ 133k points, far above any cacheable kernel
    kmat = _bilateral_kernel(bf, ccfg.block, jnp.float32)
    return jnp.round(kmat * 127.0).astype(jnp.int8)


def _cached_matmul(kmat: jnp.ndarray, z: jnp.ndarray, dt) -> jnp.ndarray:
    """kmat @ z in the cache's storage dtype (CRFConfig.kernel_int8)."""
    if kmat.dtype != jnp.int8:
        return kmat @ z
    zmax = jnp.maximum(jnp.max(jnp.abs(z)).astype(jnp.float32), 1e-20)
    z8 = jnp.round(z.astype(jnp.float32) * (127.0 / zmax)).astype(jnp.int8)
    mi = jax.lax.dot(kmat, z8, preferred_element_type=jnp.int32)
    return (mi.astype(jnp.float32) * (zmax / (127.0 * 127.0))).astype(dt)


def _batch_apply(make_fn, images, ccfg: CRFConfig, n_shards: int, *batched_args):
    """Pick the batch strategy around per-image kernel caching.

    * no kernel cache (streaming tiles) -> vmap;
    * cache active, EXPLICIT strategy "map" -> lax.map one image per step
      (opt-in only since r5 — the shape faults the v5e worker composed
      with a backbone AND standalone with unrolled grid iterations: see
      ``CRFConfig.batch_strategy``);
    * cache active, strategy "vmap"/"auto" -> vmap if the per-device
      kernels fit the budget, else cache-sized chunked vmap groups, else
      DISABLE the cache and vmap the streaming path. A lax.map over a
      sharded batch axis would be wrong regardless: a scan's leading axis
      cannot stay partitioned, so GSPMD would gather every shard to every
      device and serialize the whole batch — n_devices x the work of
      streaming in parallel.

    ``make_fn``: ccfg -> (image, *logits) -> result, so the strategy can
    rebuild the per-image closure with caching disabled.
    ``n_shards``: number of devices the batch axis is sharded across (1 for
    unsharded callers; ``make_eval_step`` passes its mesh size via
    ``EvalConfig.batch_shards``).
    """
    b = images.shape[0]
    ds = ccfg.downsample
    h, w = images.shape[-2:]
    hd, wd = (h // ds, w // ds) if ds > 1 else (h, w)
    n_pts = hd * wd
    n_phases = len(_jbu_phases(ccfg, h, w))
    if n_phases:
        n_pts *= n_phases  # JBU point set = P phase grids
    per_img = _kernel_cache_bytes(n_pts, ccfg)
    strategy = ccfg.batch_strategy
    if strategy == "map" and n_shards > 1:
        strategy = "vmap"  # a scan's leading axis cannot stay partitioned
    if per_img is not None:
        if strategy == "map":
            # EXPLICIT opt-in only (was also "auto" on one device until r5:
            # with the rolled mean-field loop, one image at a time measured
            # fastest standalone — ds=4 batch 16: 182 img/s vs 141 vmapped.
            # The r5 UNROLLED grid iterations fault the v5e worker under
            # lax.map even standalone — extending the r4 composed-only
            # bisect — so "auto" now resolves to the vmap family
            # everywhere, and this branch remains for single-image-memory
            # callers on stacks where the map shape is healthy).
            fn = make_fn(ccfg)
            return jax.lax.map(lambda args: fn(*args),
                               (images, *batched_args))
        per_dev = -(-b // n_shards) * per_img  # ceil: uneven shards hold more
        if per_dev > _VMAP_KERNEL_BUDGET_BYTES:
            chunk = int(_VMAP_KERNEL_BUDGET_BYTES // per_img)
            while chunk > 1 and b % chunk:
                chunk -= 1  # largest divisor keeps every chunk's shape static
            if n_shards <= 1 and 1 < chunk < b and b // chunk <= _MAX_VMAP_CHUNKS:
                # cache-sized chunked vmap (r5, fixes the inverted batch
                # sweep): sequential groups of vmap-`chunk`, so the resident
                # kernels stay inside the budget at ANY batch instead of
                # falling all the way back to streaming tiles (batch 32/64
                # measured 62-65 img/s streaming vs 78 at batch 16 with the
                # cache, BENCH_r04). The groups are UNROLLED python-level
                # vmap calls, not a lax.map: lax.map around the cached
                # coarse-prefix mean field composed with a large backbone is
                # the exact shape that crashes the v5e worker (see
                # batch_strategy above), while unrolled+vmap is the
                # TPU-validated form.
                fn = jax.vmap(make_fn(ccfg))
                outs = []
                for g in range(b // chunk):
                    sl = slice(g * chunk, (g + 1) * chunk)
                    outs.append(fn(images[sl], *[a[sl] for a in batched_args]))
                return jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0),
                                    *outs)
            # no usable chunking (sharded mesh, prime batch, or too many
            # groups): drop the cache and vmap the streaming path (tiles
            # recomputed per iteration)
            streaming = make_fn(dataclasses.replace(ccfg, kernel_cache_mb=0))
            return jax.vmap(streaming)(images, *batched_args)
    return jax.vmap(make_fn(ccfg))(images, *batched_args)


# per-DEVICE kernel memory allowed under vmap (sharded meshes) before
# dropping the cache
_VMAP_KERNEL_BUDGET_BYTES = int(1.5 * 2**30)

# most unrolled chunk groups _batch_apply will emit before preferring the
# streaming path (bounds program size for very large batches)
_MAX_VMAP_CHUNKS = 16


def dense_crf(image: jnp.ndarray, logits: jnp.ndarray, ccfg: CRFConfig = CRFConfig()):
    """Mean-field dense CRF refinement for one image.

    image: [3, H, W] raw pixel values 0..255 (channel order irrelevant —
    the bilateral kernel is isotropic in color).
    logits: [C, h, w] at any resolution; upsampled to (H, W) like the
    reference (bilinear, align_corners=False).
    Returns Q: [C, H, W] refined probabilities.
    """
    return dense_crf_multi(image, [logits], ccfg)[0]


def dense_crf_batch(images: jnp.ndarray, logits: jnp.ndarray,
                    ccfg: CRFConfig = CRFConfig(),
                    n_shards: int = 1) -> jnp.ndarray:
    """Batched refinement: images [B, 3, H, W], logits [B, C, h, w].

    Batch strategy (vmap / lax.map / cache-off) picked by ``_batch_apply``;
    pass ``n_shards`` when the batch axis is sharded across a mesh."""
    return _batch_apply(
        lambda cc: (lambda im, lg: dense_crf(im, lg, cc)),
        images, ccfg, n_shards, logits)


def dense_crf_multi_batch(images: jnp.ndarray, logits_list,
                          ccfg: CRFConfig = CRFConfig(), n_shards: int = 1):
    """Refine several batched logit sets sharing each image's kernel.

    images: [B, 3, H, W]; logits_list: list of [B, C_k, h, w].
    Returns a list of [B, C_k, H, W]. ``n_shards``: see ``dense_crf_batch``.
    """
    return _batch_apply(
        lambda cc: (lambda im, *lgs: tuple(dense_crf_multi(im, list(lgs), cc))),
        images, ccfg, n_shards, *logits_list)
