"""Device mesh + sharding helpers — the framework's scaling layer.

The reference has no model/data parallelism beyond single-process DataParallel
(SURVEY.md §2.7). The TPU-native replacement: a 1-D ``Mesh(("data",))`` over
the ICI-connected slice, batch-sharded jitted steps (XLA inserts the psum for
gradient/metric reduction), and replicated parameters. The same helpers back
the sharded KNN matmul (``parallel.knn``) and eval loop.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, n_devices: int | None = None,
                        axis: str = "data") -> Mesh:
    """Largest mesh (<= available devices) whose size divides the batch."""
    avail = len(jax.devices()) if n_devices is None else n_devices
    d = max(k for k in range(1, avail + 1) if batch_size % k == 0)
    if d < avail:
        import logging

        logging.getLogger(__name__).warning(
            "batch_size=%d not divisible by %d devices: using a %d-device "
            "mesh (%d device(s) idle) — pick a divisible batch size",
            batch_size, avail, d, avail - d)
    return make_mesh(d, axis)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch dict onto the mesh, sharded along dim 0."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated(mesh)), tree)
