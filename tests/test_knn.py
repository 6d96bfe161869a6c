"""Sharded KNN: pad rows never returned; single-device == sharded."""

import numpy as np

import jax.numpy as jnp

from depthg_tpu.parallel import knn as knn_lib
from depthg_tpu.parallel import mesh as mesh_lib


def test_topk_pad_rows_excluded_and_matches_single():
    rng = np.random.default_rng(0)
    n = 300  # not a multiple of 8 * chunk -> heavy padding in the sharded path
    feats = rng.standard_normal((n, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    # make some rows anti-correlated so real sims go negative (a zero-sim pad
    # row would outrank them if not masked)
    feats[n // 2:] = -feats[: n - n // 2]

    single = knn_lib.topk_neighbors(jnp.asarray(feats), k=10, chunk=128)
    assert single.max() < n
    assert (single[:, 0] == np.arange(n)).all()

    mesh = mesh_lib.make_mesh(8)
    sharded = knn_lib.topk_neighbors(jnp.asarray(feats), k=10, chunk=128, mesh=mesh)
    assert sharded.max() < n, "padded key rows leaked into top-k"
    np.testing.assert_array_equal(single, sharded)


def test_topk_key_blocking_matches_single_pass(monkeypatch):
    """The two-level (per-key-block) top-k must be exactly the global
    top-k; force tiny blocks so the blocked path runs under test shapes."""
    import jax.numpy as jnp

    from depthg_tpu.parallel import knn as knn_lib

    rng = np.random.default_rng(3)
    feats = rng.standard_normal((300, 16)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)

    ref = knn_lib.topk_neighbors(jnp.asarray(feats), k=7, chunk=64,
                                 precision="highest")
    monkeypatch.setattr(knn_lib, "_KEY_BLOCK", 64)
    knn_lib._topk_chunked.clear_cache()
    blocked = knn_lib.topk_neighbors(jnp.asarray(feats), k=7, chunk=64,
                                     precision="highest")
    knn_lib._topk_chunked.clear_cache()
    np.testing.assert_array_equal(np.asarray(blocked), np.asarray(ref))
