"""Serving harness: dynamic batching, HTTP round-trips, checkpoint glue.

The reference has no online-serving surface (its demo is an offline directory
loop, ``src/demo_segmentation.py:63-81``); these tests pin the TPU-native
serving contract instead: concurrent requests coalesce into ONE bucketed
device batch, every response is bit-identical to a standalone predict, and
errors propagate per request without wedging the dispatcher."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

import jax

from depthg_tpu.inference import EvalConfig
from depthg_tpu.models.featurizer import FeaturizerConfig, featurizer_init
from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
from depthg_tpu.models.vit import ViTConfig
from depthg_tpu.serve import (BatcherMetrics, DynamicBatcher,
                              SegmentationService, serve_http)


def _tiny_service(run_crf=False, max_batch=8, max_wait_ms=150.0):
    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                     img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=run_crf, label_res=32)
    key = jax.random.PRNGKey(0)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    return SegmentationService(params, fcfg, ecfg, res=32,
                               max_batch=max_batch, max_wait_ms=max_wait_ms)


def _png_bytes(seed=0, size=48):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def test_dynamic_batcher_coalesces_concurrent_submits():
    calls = []

    def run_batch(items):
        calls.append(len(items))
        return [x * 2 for x in items]

    b = DynamicBatcher(run_batch, max_batch=8, max_wait_ms=200.0)
    try:
        results = [None] * 6
        threads = [threading.Thread(target=lambda i=i: results.__setitem__(
            i, b.submit(i))) for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(10)
        assert results == [i * 2 for i in range(6)]
        snap = b.metrics.snapshot()
        assert snap["requests"] == 6 and snap["errors"] == 0
        # six requests inside one 200ms window must not run as six batches
        assert snap["batches"] < 6 and sum(calls) == 6
    finally:
        b.close()


def test_dynamic_batcher_full_batch_dispatches_immediately():
    seen = threading.Event()

    def run_batch(items):
        seen.set()
        return items

    b = DynamicBatcher(run_batch, max_batch=1, max_wait_ms=60_000.0)
    try:
        t0 = time.monotonic()
        assert b.submit("x", timeout=10) == "x"
        assert time.monotonic() - t0 < 5  # never waited the 60s window
        assert seen.is_set()
    finally:
        b.close()


def test_dynamic_batcher_propagates_errors_per_request():
    def run_batch(items):
        raise ValueError("boom")

    b = DynamicBatcher(run_batch, max_batch=4, max_wait_ms=5.0)
    try:
        with pytest.raises(ValueError, match="boom"):
            b.submit(1)
        # the dispatcher survives a failing batch
        b._run_batch = lambda items: items
        assert b.submit(7) == 7
        assert b.metrics.snapshot()["errors"] == 1
    finally:
        b.close()


def test_bucket_set_matches_dispatchable_buckets():
    """warmup()'s enumeration must equal the set _run_batch can emit —
    including the non-power-of-two max_batch cap and mesh minimums."""
    from depthg_tpu.serve import _bucket, bucket_set

    for max_batch, min_bucket in ((16, 1), (12, 1), (12, 6), (18, 6), (8, 8)):
        reachable = {_bucket(n, max_batch, min_bucket)
                     for n in range(1, max_batch + 1)}
        assert reachable == set(bucket_set(max_batch, min_bucket)), (
            max_batch, min_bucket)
        assert all(b % min_bucket == 0 for b in reachable)


def test_sharded_service_rejects_indivisible_max_batch():
    from depthg_tpu.parallel import mesh as mesh_lib

    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=1, num_heads=2,
                     img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=False, label_res=32)
    key = jax.random.PRNGKey(0)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    with pytest.raises(ValueError, match="multiple of the mesh"):
        SegmentationService(params, fcfg, ecfg, res=32, max_batch=3,
                            mesh=mesh_lib.make_mesh(2))


def test_metrics_quantiles_empty_and_filled():
    m = BatcherMetrics()
    assert m.snapshot()["latency_ms_p50"] is None
    for v in (1.0, 2.0, 3.0, 4.0):
        m.record_request(v, ok=True)
    snap = m.snapshot()
    assert snap["latency_ms_p50"] == 3.0 and snap["latency_ms_p99"] == 4.0


def test_service_matches_standalone_predict():
    svc = _tiny_service()
    try:
        body = _png_bytes(1)
        linear, cluster = svc.segment_bytes(body)
        assert linear.shape == (32, 32) and cluster.shape == (32, 32)
        # same bytes again -> identical maps (pure function of the input)
        l2, c2 = svc.segment_bytes(body)
        np.testing.assert_array_equal(linear, l2)
        np.testing.assert_array_equal(cluster, c2)
        assert 0 <= int(cluster.min()) and int(cluster.max()) < 5
    finally:
        svc.close()


def test_http_server_routes_and_batching():
    svc = _tiny_service(max_wait_ms=250.0)
    server = serve_http(svc, port=0)
    port = server.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        svc.warmup(buckets=(4,))

        health = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert health["status"] == "ok"

        # three concurrent posts inside one window -> one device batch
        outs = [None] * 3

        def post(i):
            req = urllib.request.Request(
                f"{base}/v1/segment?format=npz", data=_png_bytes(i),
                method="POST")
            outs[i] = urllib.request.urlopen(req, timeout=60).read()

        before = svc.batcher.metrics.snapshot()["batches"]
        threads = [threading.Thread(target=post, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(60)
        after = svc.batcher.metrics.snapshot()
        assert after["batches"] - before < 3
        for out in outs:
            blob = np.load(io.BytesIO(out))
            assert blob["linear"].shape == (32, 32)
            assert blob["cluster"].dtype == np.int32

        # png + json formats and the error paths
        req = urllib.request.Request(
            f"{base}/v1/segment?format=png&probe=linear",
            data=_png_bytes(9), method="POST")
        png = urllib.request.urlopen(req, timeout=60).read()
        from PIL import Image

        assert Image.open(io.BytesIO(png)).size == (32, 32)

        req = urllib.request.Request(
            f"{base}/v1/segment?format=json", data=_png_bytes(9),
            method="POST")
        js = json.loads(urllib.request.urlopen(req, timeout=60).read())
        assert len(js["cluster"]) == 32

        for bad in (f"{base}/v1/segment?format=bmp",
                    f"{base}/v1/segment?format=png&probe=liner",
                    f"{base}/v1/nope"):
            req = urllib.request.Request(bad, data=_png_bytes(2),
                                         method="POST")
            with pytest.raises(urllib.error.HTTPError) as exc:
                urllib.request.urlopen(req, timeout=60)
            assert exc.value.code in (400, 404)
        req = urllib.request.Request(f"{base}/v1/segment", data=b"",
                                     method="POST")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 400

        metrics = json.loads(urllib.request.urlopen(f"{base}/metrics").read())
        assert metrics["requests"] >= 5
    finally:
        server.shutdown()
        svc.close()


def test_sharded_service_pads_to_mesh():
    """With a mesh, every bucket rounds up to the mesh size so shard_map's
    batch-axis division always holds — a lone request still answers."""
    from depthg_tpu.parallel import mesh as mesh_lib

    tiny = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                     img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=tiny)
    ecfg = EvalConfig(n_classes=5, run_crf=False, label_res=32)
    key = jax.random.PRNGKey(0)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    svc = SegmentationService(params, fcfg, ecfg, res=32, max_batch=4,
                              max_wait_ms=5.0, mesh=mesh_lib.make_mesh(2))
    single = SegmentationService(params, fcfg, ecfg, res=32, max_batch=4,
                                 max_wait_ms=5.0)
    try:
        body = _png_bytes(4)
        lin_m, clu_m = svc.segment_bytes(body)
        lin_1, clu_1 = single.segment_bytes(body)
        np.testing.assert_array_equal(lin_m, lin_1)
        np.testing.assert_array_equal(clu_m, clu_1)
        snap = svc.batcher.metrics.snapshot()
        assert snap["pad_fraction"] == 0.5  # 1 real row in a 2-row bucket
    finally:
        svc.close()
        single.close()


def test_build_service_from_native_checkpoint(tmp_path):
    """The CLI glue: save_native -> build_service -> one request, with the
    run-config's arch keys driving the featurizer dispatch."""
    from depthg_tpu.utils.checkpoint_io import save_native
    from scripts.serve import build_service

    # full-size ViT-S/8 params: the restored run_cfg carries only the arch
    # keys, so the service must reconstruct the default backbone shape
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16)
    key = jax.random.PRNGKey(0)
    params = {"net": featurizer_init(key, fcfg),
              "linear_probe": linear_probe_init(key, 16, 5),
              "cluster_probe": cluster_lookup_init(key, 16, 5)}
    ckpt = tmp_path / "ckpt"
    save_native(str(ckpt), params, {"model_type": "vit_small",
                                    "dino_patch_size": 8, "dim": 16,
                                    "n_classes": 5})

    from depthg_tpu.config import load_config

    cfg = load_config("serve_config.yml",
                      [f"model_path={ckpt}", "res=32", "run_crf=False",
                       "max_batch=2", "max_wait_ms=5", "warmup=False"])
    svc = build_service(cfg)
    try:
        linear, cluster = svc.segment_bytes(_png_bytes(3))
        assert linear.shape == (32, 32)
    finally:
        svc.close()
