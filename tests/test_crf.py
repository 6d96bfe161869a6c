"""Dense CRF: blockwise message == naive dense reference; refinement behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from depthg_tpu.ops.crf import (
    CRFConfig,
    _bilateral_features,
    _bilateral_message,
    _gaussian_filter,
    dense_crf,
)

RNG = np.random.default_rng(5)


def test_blockwise_bilateral_matches_naive():
    n, f, c = 300, 5, 4  # n not a multiple of block → exercises padding
    feats = RNG.standard_normal((n, f)).astype(np.float32)
    vals = RNG.standard_normal((n, c)).astype(np.float32)
    d = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    want = np.exp(-d / 2) @ vals
    got = np.asarray(_bilateral_message(jnp.asarray(feats), jnp.asarray(vals), block=128))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_gaussian_filter_matches_naive():
    c, h, w = 3, 12, 14
    q = RNG.standard_normal((c, h, w)).astype(np.float32)
    sigma = 1.0
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pos = np.stack([yy.ravel(), xx.ravel()], -1).astype(np.float64)
    d = ((pos[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    k = np.exp(-d / (2 * sigma**2))
    want = (k @ q.reshape(c, -1).T).T.reshape(c, h, w)
    got = np.asarray(_gaussian_filter(jnp.asarray(q), sigma))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_crf_preserves_confident_regions_and_normalizes():
    # two-color image with noisy unaries: CRF should denoise inside regions
    h = w = 32
    img = np.zeros((3, h, w), np.float32)
    img[:, :, : w // 2] = 200.0
    img[:, :, w // 2:] = 30.0
    true = np.zeros((h, w), np.int64)
    true[:, w // 2:] = 1

    logits = np.zeros((2, h, w), np.float32)
    logits[0] = np.where(true == 0, 2.0, -2.0)
    logits[1] = -logits[0]
    noise_mask = RNG.random((h, w)) < 0.15
    logits[:, noise_mask] *= -1  # flip 15% of pixels

    q = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits),
                             CRFConfig(downsample=1, block=256)))
    np.testing.assert_allclose(q.sum(0), 1.0, atol=1e-4)
    pred = q.argmax(0)
    noisy_acc = (np.where(noise_mask, 1 - true, true) == true).mean()
    crf_acc = (pred == true).mean()
    assert crf_acc > noisy_acc
    assert crf_acc > 0.97


def test_crf_downsample_close_to_exact():
    # structured scene (piecewise-constant colors, coherent logits): the 2x
    # working-resolution approximation must agree with exact full-res CRF
    h = w = 64
    img = np.zeros((3, h, w), np.float32)
    img[0, : h // 2] = 220.0
    img[1, h // 2:, : w // 2] = 180.0
    img[2, h // 2:, w // 2:] = 140.0
    img += RNG.random((3, h, w)).astype(np.float32) * 10
    logits = np.full((3, h, w), -1.0, np.float32)
    logits[0, : h // 2] = 1.0
    logits[1, h // 2:, : w // 2] = 1.0
    logits[2, h // 2:, w // 2:] = 1.0
    logits += RNG.standard_normal((3, h, w)).astype(np.float32)
    q1 = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits), CRFConfig(downsample=1, block=512)))
    q2 = np.asarray(dense_crf(jnp.asarray(img), jnp.asarray(logits), CRFConfig(downsample=2, block=512)))
    agree = (q1.argmax(0) == q2.argmax(0)).mean()
    assert agree > 0.95


def test_batch_strategy_auto_never_maps(monkeypatch):
    """"auto" must resolve to the vmap family everywhere (r5: lax.map
    faults the v5e worker composed with a backbone AND standalone with
    unrolled grid iterations) — sharded or not; explicit "map" remains an
    opt-in that does take the sequential path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops import crf as crf_mod

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32) * 255)
    logits = jnp.asarray(rng.standard_normal((4, 3, 8, 8)).astype(np.float32))
    ccfg = crf_mod.CRFConfig(downsample=2, block=64, max_iter=3)

    ref = np.asarray(crf_mod.dense_crf_batch(images, logits, ccfg))

    # force "kernels do not fit batched" (budget below one 16x16 kernel)
    monkeypatch.setattr(crf_mod, "_VMAP_KERNEL_BUDGET_BYTES", 1)

    calls = {"map": 0}
    orig_map = jax.lax.map

    def counting_map(*a, **k):
        calls["map"] += 1
        return orig_map(*a, **k)

    monkeypatch.setattr(jax.lax, "map", counting_map)

    # unsharded auto over budget: streaming vmap, never lax.map
    out_seq = np.asarray(crf_mod.dense_crf_batch(images, logits, ccfg))
    assert calls["map"] == 0
    # cached-kernel vs streaming differ only in reduction order, which the
    # 3-iteration mean field amplifies slightly — labels must match
    np.testing.assert_allclose(out_seq, ref, atol=5e-3)
    assert (out_seq.argmax(1) == ref.argmax(1)).mean() > 0.999

    # sharded: same — vmap the streaming (cache-off) path
    out_shard = np.asarray(crf_mod.dense_crf_batch(images, logits, ccfg,
                                                   n_shards=4))
    assert calls["map"] == 0
    np.testing.assert_allclose(out_shard, ref, atol=5e-3)
    assert (out_shard.argmax(1) == ref.argmax(1)).mean() > 0.999

    # explicit "map" opt-in still takes the sequential path (restore the
    # budget so the cache is active — the map branch is cache-gated)
    monkeypatch.setattr(crf_mod, "_VMAP_KERNEL_BUDGET_BYTES",
                        int(1.5 * 2**30))
    out_map = np.asarray(crf_mod.dense_crf_batch(
        images, logits, dataclasses.replace(ccfg, batch_strategy="map")))
    assert calls["map"] == 1
    np.testing.assert_allclose(out_map, ref, atol=5e-3)


def test_batch_strategy_vmap_chunks_before_dropping_cache(monkeypatch):
    """Strategy "vmap" over budget must run cache-sized UNROLLED vmap chunks
    (r5: fixes the inverted batch sweep) — never lax.map (the composed-crash
    shape), and only fall to streaming when no divisor chunk exists."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops import crf as crf_mod

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 3, 32, 32)).astype(np.float32) * 255)
    logits = jnp.asarray(rng.standard_normal((4, 3, 8, 8)).astype(np.float32))
    ccfg = crf_mod.CRFConfig(downsample=2, block=64, max_iter=3,
                             batch_strategy="vmap")
    ref = np.asarray(crf_mod.dense_crf_batch(images, logits, ccfg))

    # budget of exactly one 16x16 f32 kernel -> chunk size 1..? per_img =
    # 256*256*4 bytes; allow two kernels so the divisor search lands on 2
    per_img = (16 * 16) ** 2 * 4
    monkeypatch.setattr(crf_mod, "_VMAP_KERNEL_BUDGET_BYTES", 2 * per_img)

    calls = {"map": 0}
    orig_map = jax.lax.map

    def counting_map(*a, **k):
        calls["map"] += 1
        return orig_map(*a, **k)

    monkeypatch.setattr(jax.lax, "map", counting_map)

    out = np.asarray(crf_mod.dense_crf_batch(images, logits, ccfg))
    assert calls["map"] == 0  # chunked path must not touch lax.map
    np.testing.assert_allclose(out, ref, atol=1e-5)

    # prime batch (no divisor chunk > 1): falls back to streaming vmap
    images5 = jnp.concatenate([images, images[:1]])
    logits5 = jnp.concatenate([logits, logits[:1]])
    monkeypatch.setattr(crf_mod, "_VMAP_KERNEL_BUDGET_BYTES", per_img)
    out5 = np.asarray(crf_mod.dense_crf_batch(images5, logits5, ccfg))
    assert calls["map"] == 0
    ref5 = np.asarray(crf_mod.dense_crf_batch(
        images5, logits5, dataclasses.replace(ccfg, kernel_cache_mb=0)))
    np.testing.assert_allclose(out5, ref5, atol=1e-5)


def test_jbu_operator_matches_explicit_matrix():
    """splat_phases: apply_a must equal the explicit D^-1/2 S^T K S D^-1/2
    (the operator folds the symmetric degree normalization into the splat
    weights) with S the color-weighted phase-splat matrix, K the phase-grid
    dense kernel, and deg = S^T K S @ 1."""
    from depthg_tpu.ops.crf import CRFConfig, _jbu_operator, _phase_offsets

    rng = np.random.default_rng(5)
    h = w = 16
    ds = 4
    image = rng.uniform(0, 255, (3, h, w)).astype(np.float32)
    ccfg = CRFConfig(downsample=ds, splat_phases=2, block=8)
    phases = _phase_offsets(2, ds)
    apply_a, deg, _, _ = _jbu_operator(jnp.asarray(image), ccfg, ds, jnp.float32,
                                    phases)

    # explicit numpy construction
    hd, wd = h // ds, w // ds
    nc = hd * wd
    n = h * w
    feats, S = [], np.zeros((len(phases) * nc, n), np.float64)
    for pi, (oy, ox) in enumerate(phases):
        img_p = image[:, oy::ds, ox::ds]
        ys = (np.arange(hd) * ds + oy) / ccfg.bi_xy_std
        xs = (np.arange(wd) * ds + ox) / ccfg.bi_xy_std
        f = np.stack([np.broadcast_to(xs[None, :], (hd, wd)),
                      np.broadcast_to(ys[:, None], (hd, wd)),
                      *(img_p / ccfg.bi_rgb_std)]).reshape(5, -1).T
        feats.append(f)
        for py in range(h):
            for px in range(w):
                cell = (py // ds) * wd + (px // ds)
                drgb = (image[:, py, px] - img_p[:, py // ds, px // ds]) / ccfg.bi_rgb_std
                S[pi * nc + cell, py * w + px] = np.exp(-0.5 * np.sum(drgb ** 2))
    feats = np.concatenate(feats)
    d2 = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    K = np.exp(-0.5 * d2)
    A = S.T @ K @ S

    q = rng.random((3, h, w)).astype(np.float32)
    got = np.asarray(apply_a(jnp.asarray(q)))
    deg_np = A @ np.ones(n)
    isd = 1.0 / np.sqrt(np.maximum(deg_np, 1e-20))
    A_norm = (isd[:, None] * A) * isd[None, :]
    want = (A_norm @ q.reshape(3, -1).T).T.reshape(3, h, w)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(deg), deg_np.reshape(h, w),
                               rtol=2e-3, atol=1e-3)


def test_jbu_crf_end_to_end_and_batch():
    """splat_phases dense_crf: valid distributions, batched strategies run."""
    from depthg_tpu.ops.crf import CRFConfig, dense_crf, dense_crf_batch

    rng = np.random.default_rng(6)
    image = jnp.asarray(rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((5, 8, 8)).astype(np.float32))
    ccfg = CRFConfig(downsample=4, splat_phases=2, block=32, max_iter=3)
    q = dense_crf(image, logits, ccfg)
    assert q.shape == (5, 32, 32)
    np.testing.assert_allclose(np.asarray(q.sum(0)), 1.0, atol=1e-4)

    imgs = jnp.asarray(rng.uniform(0, 255, (3, 3, 32, 32)).astype(np.float32))
    lgs = jnp.asarray(rng.standard_normal((3, 5, 8, 8)).astype(np.float32))
    qb = dense_crf_batch(imgs, lgs, ccfg)
    assert qb.shape == (3, 5, 32, 32)
    # per-image path must equal the batched path
    np.testing.assert_allclose(np.asarray(qb[0]),
                               np.asarray(dense_crf(imgs[0], lgs[0], ccfg)),
                               atol=1e-5)


def test_jbu_coarse_prefix_variants():
    """CRFConfig.coarse_prefix: a prefix of coarse-point iterations plus
    full-res refinements must stay a valid distribution per logit set, agree
    closely with the all-full-res run on easy structure, and run at the
    all-coarse extreme (prefix = max_iter: hand-off only)."""
    import dataclasses

    from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi

    rng = np.random.default_rng(11)
    # piecewise-constant color scene with noisy logits favoring 2 segments
    image = np.zeros((3, 32, 32), np.float32)
    image[:, :, :16] = np.array([200.0, 30.0, 40.0])[:, None, None]
    image[:, :, 16:] = np.array([20.0, 180.0, 220.0])[:, None, None]
    logits = rng.standard_normal((5, 8, 8)).astype(np.float32) * 0.5
    logits[0, :, :4] += 2.0
    logits[1, :, 4:] += 2.0
    lg2 = rng.standard_normal((3, 8, 8)).astype(np.float32)
    base = CRFConfig(downsample=8, splat_phases=4, splat_sigma_factor=1.8,
                     block=64, max_iter=6)
    outs = {}
    for cp in (0, 4, 6):
        ccfg = dataclasses.replace(base, coarse_prefix=cp)
        qa, qb = dense_crf_multi(jnp.asarray(image),
                                 [jnp.asarray(logits), jnp.asarray(lg2)], ccfg)
        for q, c in ((qa, 5), (qb, 3)):
            assert q.shape == (c, 32, 32)
            assert np.isfinite(np.asarray(q)).all()
            s = np.asarray(q).sum(0)
            np.testing.assert_allclose(s, np.ones_like(s), atol=2e-2)
        outs[cp] = np.asarray(qa).argmax(0)
    # the prefix run must land on (nearly) the same labels as all-full-res
    assert (outs[4] == outs[0]).mean() > 0.97
    assert (outs[6] == outs[0]).mean() > 0.9


def test_jbu_default_handles_odd_resolution():
    """res % downsample != 0 must take the resize-based mixed path instead of
    crashing in the phase-grid splat (regression: the ds=8 P=4 default made
    e.g. res=36 unusable)."""
    import dataclasses

    from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi

    rng = np.random.default_rng(7)
    image = jnp.asarray(rng.uniform(0, 255, (3, 36, 36)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((5, 9, 9)).astype(np.float32))
    ccfg = CRFConfig(downsample=8, splat_phases=4, splat_sigma_factor=1.8,
                     dtype="bfloat16", block=64, max_iter=3)
    (q,) = dense_crf_multi(image, [logits], ccfg)
    assert q.shape == (5, 36, 36)
    assert np.isfinite(np.asarray(q)).all()
    s = np.asarray(q).sum(0)
    np.testing.assert_allclose(s, np.ones_like(s), atol=2e-2)

    # divisible size still takes the phase path (same config)
    image2 = jnp.asarray(rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
    (q2,) = dense_crf_multi(image2, [logits], ccfg)
    assert q2.shape == (5, 32, 32)


def test_int8_kernel_cache_matches_f32():
    """CRFConfig.kernel_int8 stores the cached kernel int8 (fixed scale 127)
    with a dynamically-scaled int8 message matmul. On both the JBU and the
    resize-based cached paths the refined distributions must track the f32
    cache closely (quantization error ~0.4% per entry) and must NOT change
    the argmax on confidently-labeled pixels."""
    import dataclasses

    from depthg_tpu.ops.crf import (CRFConfig, _kernel_cache_bytes, dense_crf,
                                    dense_crf_multi)

    rng = np.random.default_rng(8)
    image = jnp.asarray(rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
    logits = jnp.asarray(2.0 * rng.standard_normal((5, 8, 8)).astype(np.float32))

    for base in (
        CRFConfig(downsample=4, splat_phases=2, block=32, max_iter=5),  # JBU
        CRFConfig(downsample=2, splat_phases=0, block=32, max_iter=5),  # resize
        CRFConfig(downsample=2, mixed_resolution=False, block=32,
                  max_iter=5),                                          # legacy
    ):
        cc8 = dataclasses.replace(base, kernel_int8=True)
        # the strategy budget must follow the 1-byte storage
        n = (32 // base.downsample) ** 2 * max(base.splat_phases, 1)
        assert _kernel_cache_bytes(n, cc8) == n * n
        assert _kernel_cache_bytes(n, base) == n * n * (
            2 if base.dtype == "bfloat16" else 4)
        q32 = np.asarray(dense_crf(image, logits, base))
        q8 = np.asarray(dense_crf(image, logits, cc8))
        assert np.isfinite(q8).all()
        # iterated softmaxes amplify the ~0.4% quantization noise at a few
        # decision-boundary pixels; the distribution must stay close almost
        # everywhere and the LABELS must agree
        frac_close = (np.abs(q8 - q32) < 0.02).mean()
        assert frac_close > 0.99, frac_close
        np.testing.assert_allclose(q8, q32, atol=0.15)
        agree = (q8.argmax(0) == q32.argmax(0)).mean()
        assert agree > 0.995, agree

    # multi-field path shares the quantized kernel across probes
    lg2 = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    cc = dataclasses.replace(CRFConfig(downsample=4, splat_phases=2, block=32,
                                       max_iter=3), kernel_int8=True)
    qa, qb = dense_crf_multi(image, [logits, lg2], cc)
    assert qa.shape == (5, 32, 32) and qb.shape == (4, 32, 32)
    np.testing.assert_allclose(np.asarray(qa.sum(0)), 1.0, atol=1e-3)


def test_operating_point_overrides_precedence():
    """operating_point expansion: the point beats the YAML default, explicit
    crf_* overrides beat the point (scripts/eval_segmentation.py r5)."""
    from depthg_tpu.config import load_config
    from depthg_tpu.ops.crf import (EVAL_OPERATING_POINTS,
                                    crf_config_from_cfg,
                                    operating_point_overrides)

    assert set(EVAL_OPERATING_POINTS) == {"default", "quality_plus", "fast",
                                          "safe"}
    ov = operating_point_overrides("quality_plus")
    cfg = load_config("depthg_tpu/configs/eval_config.yml", ov)
    assert crf_config_from_cfg(cfg).downsample == 4
    # explicit user override applied after the point wins
    cfg2 = load_config("depthg_tpu/configs/eval_config.yml",
                       ov + ["crf_downsample=2"])
    assert crf_config_from_cfg(cfg2).downsample == 2
    # "fast" = documented cp8 row (below the 88% bar, explicit opt-in)
    cfg3 = load_config("depthg_tpu/configs/eval_config.yml",
                       operating_point_overrides("fast"))
    assert crf_config_from_cfg(cfg3).coarse_prefix == 8


def test_crf_config_r5_formulation_defaults():
    """The JBU points default to pool-matmul splat/slice + int8 kernel (r5);
    phase-free points keep the classic broadcast/bf16 formulation."""
    from depthg_tpu.ops.crf import crf_config_from_cfg

    d = crf_config_from_cfg({})
    assert d.splat_impl == "pool_matmul" and d.kernel_int8
    legacy = crf_config_from_cfg({"crf_downsample": 2})
    assert legacy.splat_impl == "broadcast" and not legacy.kernel_int8
    forced = crf_config_from_cfg({"crf_splat_impl": "broadcast",
                                  "crf_kernel_int8": False})
    assert forced.splat_impl == "broadcast" and not forced.kernel_int8


def test_crf_config_prefix_keyed_to_validated_point():
    """crf_config_from_cfg: the coarse-prefix default exists ONLY at the
    fidelity-validated ds=8/4-phase point; explicit finer downsamples get 0
    unless overridden (ADVICE r3: the prefix's drop-the-Gaussian argument
    breaks below ~4 px coarse-point spacing)."""
    from depthg_tpu.ops.crf import crf_config_from_cfg

    assert crf_config_from_cfg({}).coarse_prefix == 5  # r5 default (cp5 pm-int8)
    assert crf_config_from_cfg({"crf_downsample": 4}).coarse_prefix == 0
    assert crf_config_from_cfg({"crf_downsample": 2}).coarse_prefix == 0
    # explicit override always wins
    assert crf_config_from_cfg(
        {"crf_downsample": 4, "crf_coarse_prefix": 2}).coarse_prefix == 2


def test_negative_coarse_prefix_clamps():
    """A negative coarse_prefix must behave like 0 (ADVICE r3: it used to
    unpack absent coarse tools at trace time and run extra iterations)."""
    import dataclasses

    from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi

    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((4, 8, 8)).astype(np.float32))
    base = CRFConfig(downsample=8, splat_phases=4, block=64, max_iter=3)
    (q_neg,) = dense_crf_multi(image, [logits],
                               dataclasses.replace(base, coarse_prefix=-2))
    (q0,) = dense_crf_multi(image, [logits],
                            dataclasses.replace(base, coarse_prefix=0))
    np.testing.assert_allclose(np.asarray(q_neg), np.asarray(q0), atol=1e-6)


def test_mid_prefix_pyramid_schedule():
    """CRFConfig.mid_prefix: coarse -> half-res -> full-res scheduling must
    (a) stay a valid distribution per logit set at every cp/mp combination
    (including the all-mid and no-full-tail extremes), (b) agree closely
    with the all-full-res schedule on easy structure, and (c) give the SAME
    result whether the mid operator shares the cached kernel or recomputes
    messages from its own features — the features of the strided half-res
    grid are identical to the full-res operator's (even phase offsets), so
    any disagreement would mean the shared kernel is wrong."""
    import dataclasses

    from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi

    rng = np.random.default_rng(13)
    image = np.zeros((3, 32, 32), np.float32)
    image[:, :, :16] = np.array([200.0, 30.0, 40.0])[:, None, None]
    image[:, :, 16:] = np.array([20.0, 180.0, 220.0])[:, None, None]
    logits = rng.standard_normal((5, 8, 8)).astype(np.float32) * 0.5
    logits[0, :, :4] += 2.0
    logits[1, :, 4:] += 2.0
    lg2 = rng.standard_normal((3, 8, 8)).astype(np.float32)
    base = CRFConfig(downsample=8, splat_phases=4, splat_sigma_factor=1.8,
                     block=64, max_iter=6)

    outs = {}
    for cp, mp in ((0, 0), (2, 2), (0, 3), (2, 4), (0, 6)):
        ccfg = dataclasses.replace(base, coarse_prefix=cp, mid_prefix=mp)
        qa, qb = dense_crf_multi(jnp.asarray(image),
                                 [jnp.asarray(logits), jnp.asarray(lg2)], ccfg)
        for q, c in ((qa, 5), (qb, 3)):
            assert q.shape == (c, 32, 32)
            assert np.isfinite(np.asarray(q)).all()
            s = np.asarray(q).sum(0)
            np.testing.assert_allclose(s, np.ones_like(s), atol=2e-2)
        outs[(cp, mp)] = np.asarray(qa).argmax(0)
    assert (outs[(2, 2)] == outs[(0, 0)]).mean() > 0.97
    assert (outs[(0, 3)] == outs[(0, 0)]).mean() > 0.97
    assert (outs[(2, 4)] == outs[(0, 0)]).mean() > 0.9

    # (c) shared cached kernel == streaming from the mid grid's own features
    ccfg_cache = dataclasses.replace(base, coarse_prefix=2, mid_prefix=2)
    ccfg_stream = dataclasses.replace(ccfg_cache, kernel_cache_mb=0)
    qa1, _ = dense_crf_multi(jnp.asarray(image),
                             [jnp.asarray(logits), jnp.asarray(lg2)], ccfg_cache)
    qa2, _ = dense_crf_multi(jnp.asarray(image),
                             [jnp.asarray(logits), jnp.asarray(lg2)], ccfg_stream)
    np.testing.assert_allclose(np.asarray(qa1), np.asarray(qa2),
                               atol=2e-3, rtol=1e-2)


def test_mid_prefix_ignored_when_unrepresentable():
    """mid_prefix must fall back to full-res iterations (not crash, not
    change results) when the phase offsets are odd (ds=4: offsets {1, 3})
    or the JBU path is inactive."""
    import dataclasses

    from depthg_tpu.ops.crf import CRFConfig, dense_crf_multi

    rng = np.random.default_rng(3)
    image = jnp.asarray(rng.uniform(0, 255, (3, 32, 32)).astype(np.float32))
    logits = jnp.asarray(rng.standard_normal((5, 8, 8)).astype(np.float32))
    # ds=4 P=2 offsets are (1,1),(3,3): odd -> mid grid misses the pixels
    base = CRFConfig(downsample=4, splat_phases=2, block=64, max_iter=4)
    (q0,) = dense_crf_multi(image, [logits], base)
    (q1,) = dense_crf_multi(image, [logits],
                            dataclasses.replace(base, mid_prefix=2))
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), atol=1e-6)

    # non-JBU (splat_phases=0) path: mid_prefix silently off
    base2 = CRFConfig(downsample=2, splat_phases=0, block=64, max_iter=3)
    (q2,) = dense_crf_multi(image, [logits],
                            dataclasses.replace(base2, mid_prefix=2))
    assert np.isfinite(np.asarray(q2)).all()
