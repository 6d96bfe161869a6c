"""Serve a trained segmenter over HTTP with TPU dynamic batching.

The reference repo stops at offline eval/demo loops; this is the online
complement: one process owns the chip, requests from concurrent clients
coalesce into pow2-bucketed batches, and each batch runs the SAME fused
program the eval CLI uses (backbone + flip-TTA + probes + CRF in one jitted
step — ``depthg_tpu/inference.py``). See ``depthg_tpu/serve.py`` for the
batching design.

    python scripts/serve.py model_path=./checkpoints/run.ckpt port=8080
    curl -s -X POST --data-binary @img.jpg \
        'localhost:8080/v1/segment?format=png&probe=cluster' > labels.png
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_service(cfg):
    """Config -> warm ``SegmentationService`` (shared with tests)."""
    from depthg_tpu.parallel import mesh as mesh_lib
    from depthg_tpu.serve import SegmentationService
    from depthg_tpu.utils.checkpoint_io import (ecfg_from_checkpoint,
                                                fcfg_from_run_cfg,
                                                load_segmenter)

    params, run_cfg = load_segmenter(cfg.model_path)
    fcfg = fcfg_from_run_cfg(run_cfg)
    ecfg = ecfg_from_checkpoint(cfg, params, run_cfg)
    # serving defaults to ONE device: batch buckets must divide the mesh, so
    # multi-chip is an explicit opt-in (n_devices=8 forces buckets >= 8)
    n_devices = cfg.get("n_devices")
    mesh = (mesh_lib.make_mesh_for_batch(int(cfg.max_batch), n_devices)
            if n_devices else None)
    return SegmentationService(
        params, fcfg, ecfg, res=int(cfg.res), max_batch=int(cfg.max_batch),
        max_wait_ms=float(cfg.max_wait_ms),
        mesh=mesh if mesh is not None and mesh.devices.size > 1 else None)


def main(argv=None):
    from depthg_tpu.config import cli_overrides, load_config
    from depthg_tpu.serve import serve_http
    from depthg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    overrides = cli_overrides(argv if argv is not None else sys.argv[1:])
    cfg = load_config("serve_config.yml", overrides)

    service = build_service(cfg)
    if bool(cfg.get("warmup", True)):
        t0 = time.time()
        buckets = service.warmup()
        print(f"warmed buckets {buckets} in {time.time() - t0:.1f}s")

    server = serve_http(service, host=str(cfg.host), port=int(cfg.port),
                        start=False)
    print(f"serving on http://{cfg.host}:{server.server_address[1]} "
          f"(max_batch={cfg.max_batch}, wait={cfg.max_wait_ms}ms)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        service.close()


if __name__ == "__main__":
    main()
