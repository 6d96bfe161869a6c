"""Dataset-wide cosine-similarity KNN — the sharded-matmul replacement for
``precompute_knns``'s chunked GPU loop (reference ``src/precompute_knns.py:101-113``).

The N x N similarity is never materialized: query rows stream through the MXU
in chunks against the full key matrix, keeping only the running top-k. On a
mesh, query rows are sharded across devices ("data" axis) with keys replicated
— each chip owns N/d rows of the output, so the only collective is the final
gather of [N, k] indices. For cocostuff five-crop (N ~ 590k, C = 384) that is
~270 TFLOP of pure matmul, ICI-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.ops.correlation import norm


def pooled_features(featurizer_params, img, fcfg, precision=None):
    """Global image embedding: mean-pooled dense feats, L2-normalized
    (reference ``get_feats``, ``src/precompute_knns.py:15-21``)."""
    from depthg_tpu.models.featurizer import backbone_features

    feats, _ = backbone_features(featurizer_params, img, fcfg, precision)
    pooled = feats.mean(axis=(2, 3))
    return norm(pooled, axis=1)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _topk_chunked(feats: jnp.ndarray, k: int, chunk: int, precision=None):
    """[N, C] normalized -> [N, k] nearest-neighbor indices (self included)."""
    return _topk_inner(feats, feats, k, chunk, precision=precision)


def topk_neighbors(feats, k: int = 30, chunk: int = 1024, mesh=None,
                   precision: str | None = None) -> np.ndarray:
    """Top-k cosine neighbors for every row. ``mesh``: optional Mesh to shard
    the query dimension across devices (keys stay replicated).

    ``precision``: None = MXU default (bf16 multiply, f32 accumulate — fine
    for training, where a random neighbor of rank 1..k is drawn anyway);
    "highest" for index-exact parity with an f32 reference (near-ties in the
    cosine sims otherwise reorder under bf16 rounding)."""
    feats = jnp.asarray(feats)
    if mesh is None or mesh.devices.size == 1:
        # device_get, not np.asarray: the buffer-protocol path on unaligned
        # int arrays degenerates to element-wise reads on tunneled runtimes
        return jax.device_get(_topk_chunked(feats, k, chunk, precision))

    from jax.sharding import NamedSharding, PartitionSpec as P

    n = feats.shape[0]
    d = mesh.devices.size
    pad = (-n) % (d * chunk)
    padded = jnp.pad(feats, ((0, pad), (0, 0)))

    @functools.partial(jax.jit,
                       in_shardings=(NamedSharding(mesh, P()),),
                       out_shardings=NamedSharding(mesh, P("data")))
    def sharded(keys):
        queries = jax.lax.with_sharding_constraint(
            keys, NamedSharding(mesh, P("data")))
        return _topk_inner(queries, keys, k, chunk, valid_n=n,
                           precision=precision)

    idx = sharded(padded)
    return jax.device_get(idx)[:n]


# keys are processed in blocks of this many rows so one query chunk never
# materializes a [chunk, N] similarity matrix (9.7 GB f32 at the cocostuff
# five-crop N ~ 590k) — per-block top-k candidates are merged by a final
# top-k over nb*k columns, which is exact (the global top-k is a subset of
# the per-block top-ks)
_KEY_BLOCK = 65536


def _topk_inner(queries, keys, k, chunk, valid_n=None, precision=None):
    nq, c = queries.shape
    pad = (-nq) % chunk
    q = jnp.pad(queries, ((0, pad), (0, 0))).reshape(-1, chunk, c)
    n_keys = keys.shape[0]

    def block_sims(qb, kb, base, mask_from):
        """Similarities with key columns >= mask_from forced to -inf
        (zero-padded key rows must never win the top-k — their cosine sim
        of exactly 0 outranks negative real similarities)."""
        sims = jnp.einsum("qc,nc->qn", qb, kb,
                          preferred_element_type=jnp.float32,
                          precision=precision)
        if mask_from is not None:
            col = base + jax.lax.broadcasted_iota(jnp.int32, sims.shape, 1)
            sims = jnp.where(col >= mask_from, -jnp.inf, sims)
        return sims

    if n_keys <= 2 * _KEY_BLOCK:
        def one_chunk(qb):
            _, idx = jax.lax.top_k(block_sims(qb, keys, 0, valid_n), k)
            return idx
    else:
        kpad = (-n_keys) % _KEY_BLOCK
        keys_p = jnp.pad(keys, ((0, kpad), (0, 0)))
        nb = keys_p.shape[0] // _KEY_BLOCK
        kb_stack = keys_p.reshape(nb, _KEY_BLOCK, c)
        vmask = n_keys if valid_n is None else min(valid_n, n_keys)

        def one_chunk(qb):
            def per_block(carry, inp):
                kb, base = inp
                v, i = jax.lax.top_k(block_sims(qb, kb, base, vmask), k)
                return carry, (v, i + base)
            bases = jnp.arange(nb, dtype=jnp.int32) * _KEY_BLOCK
            _, (vals, idxs) = jax.lax.scan(per_block, 0, (kb_stack, bases))
            # [nb, chunk, k] -> [chunk, nb*k] candidates; exact global top-k
            vals = jnp.transpose(vals, (1, 0, 2)).reshape(qb.shape[0], -1)
            idxs = jnp.transpose(idxs, (1, 0, 2)).reshape(qb.shape[0], -1)
            _, sel = jax.lax.top_k(vals, k)
            return jnp.take_along_axis(idxs, sel, axis=1)

    return jax.lax.map(one_chunk, q).reshape(-1, k)[:nq]
