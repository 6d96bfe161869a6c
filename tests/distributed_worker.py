"""Multi-process worker for the cross-process mesh test.

Launched by ``tests/test_multiprocess.py`` as N separate OS processes, each
owning a slice of virtual CPU devices. This is the process topology of a real
v5e pod slice (one process per host, 4 chips each): ``jax.distributed``
wires the processes into ONE global mesh and GSPMD's collectives (the psum
behind gradient/metric reduction) cross the process boundary — the thing a
single-process 8-device dryrun can never exercise.

Prints one JSON line with the step outputs so the parent can assert
(a) every process computes identical replicated results and (b) they match a
single-process run of the same global batch.
"""

import argparse
import json
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--local-devices", type=int, default=4)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.local_devices}"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)

    import jax.numpy as jnp
    import numpy as np

    from depthg_tpu.models.featurizer import FeaturizerConfig
    from depthg_tpu.models.vit import ViTConfig
    from depthg_tpu.parallel import mesh as mesh_lib
    from depthg_tpu.train import losses as loss_lib
    from depthg_tpu.train import step as step_lib

    n_global = args.num_processes * args.local_devices
    assert len(jax.devices()) == n_global, (jax.devices(), n_global)
    assert len(jax.local_devices()) == args.local_devices

    tiny_vit = ViTConfig(patch_size=8, embed_dim=32, depth=2, num_heads=2,
                         img_size=32)
    fcfg = FeaturizerConfig(arch="vit_small", patch_size=8, dim=16,
                            vit_config=tiny_vit)
    hp = step_lib.TrainHParams(n_classes=3)
    lcfg = loss_lib.CorrLossConfig(feature_samples=3, neg_samples=2,
                                   depth_sampling="fps",
                                   depth_feat_correlation_loss=True)

    mesh = mesh_lib.make_mesh(n_global)
    state = mesh_lib.replicate(
        step_lib.init_state(jax.random.PRNGKey(0), fcfg, hp), mesh)

    # every process materializes the same GLOBAL batch (same seed), then
    # donates only its local shard — make_array_from_process_local_data is
    # the real-pod input path (each host feeds the chips it owns)
    rng = np.random.default_rng(0)
    b = 2 * n_global
    host_batch = {
        "img": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "img_pos": rng.standard_normal((b, 3, 32, 32)).astype(np.float32),
        "label": rng.integers(-1, 3, size=(b, 32, 32)),
        "depth": rng.random((b, 1, 32, 32)).astype(np.float32),
        "depth_pos": rng.random((b, 1, 32, 32)).astype(np.float32),
    }
    sharding = mesh_lib.batch_sharding(mesh)
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v, v.shape)
        for k, v in host_batch.items()
    }

    @jax.jit
    def jstep(state, batch, key):
        return step_lib.train_step(state, batch, key, fcfg, hp, lcfg,
                                   0.19, 0.03)

    state, logs = jstep(state, batch, jax.random.PRNGKey(1))
    loss = float(logs["loss/total"])  # replicated: fetch is process-local

    # eval step + psum'd confusion metrics across the process boundary
    from depthg_tpu.inference import EvalConfig, make_eval_step
    from depthg_tpu.models.probes import cluster_lookup_init, linear_probe_init
    from depthg_tpu.ops.crf import CRFConfig

    ecfg = EvalConfig(n_classes=3, run_crf=True, label_res=32,
                      crf=CRFConfig(downsample=2, block=64))
    eval_params = mesh_lib.replicate({
        "net": dict(state["params"]["net"], vit=state["frozen"]["vit"]),
        "linear_probe": linear_probe_init(jax.random.PRNGKey(2), fcfg.dim, 3),
        "cluster_probe": cluster_lookup_init(jax.random.PRNGKey(3), fcfg.dim, 3),
    }, mesh)
    estep = make_eval_step(fcfg, ecfg, mesh)
    lin_stats, clu_stats = estep(eval_params, batch["img"], batch["label"])
    lin_stats = np.asarray(jax.device_get(lin_stats))
    valid = int((host_batch["label"] >= 0).sum())

    print(json.dumps({
        "process_id": args.process_id,
        "n_global_devices": n_global,
        "loss": loss,
        "lin_stats_sum": int(lin_stats.sum()),
        "lin_stats_sha": int(np.abs(lin_stats).astype(np.int64).sum()),
        "valid_labels": valid,
        "clu_finite": bool(np.isfinite(np.asarray(
            jax.device_get(clu_stats))).all()),
    }), flush=True)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
