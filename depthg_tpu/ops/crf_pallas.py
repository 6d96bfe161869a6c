"""Pallas TPU kernel for the dense bilateral mean-field message.

The CRF's hot op is ``M = K @ Z`` with ``k_ij = exp(-||f_i - f_j||^2 / 2)``
over N ~ 25k pixels. This kernel fuses distance, exp, and the value matmul in
VMEM — the kernel matrix never exists in memory.

Measured reality check (v5e, N=25600, C=28): XLA's automatic fusion of the
blockwise formulation in ``ops.crf._bilateral_message`` achieves ~3 ms/call
vs ~9 ms for this kernel — the compiler already avoids materializing K and
pipelines better than this hand-written schedule, so the XLA path is the
production default (``CRFConfig.use_pallas=False``). The kernel is kept as
infrastructure: it is the right structure if a future Mosaic version schedules
it better, and it documents the fused algorithm explicitly.

Two tricks make it tight on the MXU:
* feature augmentation: with A_i = [f_i, -|f_i|^2/2, 1] and
  B_j = [f_j, 1, -|f_j|^2/2], one matmul A_i . B_j yields log k_ij directly
  (no separate row/col norm broadcasts inside the kernel);
* everything VMEM-resident is stored transposed ([dim, N]) so the short
  feature/channel dims sit in sublanes and N in lanes — [N, 8]-style layouts
  would waste 16x VMEM on lane padding.

Padded key rows get -1e30 in the norm slot -> kernel weight exactly 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BK = 512


def _kernel(aq_ref, b_ref, values_ref, out_ref):
    bq = aq_ref.shape[1]
    n = b_ref.shape[1]
    c = values_ref.shape[0]

    aq = aq_ref[:]  # [F, Bq]

    def body(j, acc):
        bk_blk = b_ref[:, pl.ds(j * _BK, _BK)]       # [F, BK]
        zs = values_ref[:, pl.ds(j * _BK, _BK)]      # [C, BK]
        # log-kernel needs full f32: exp() amplifies bf16 matmul rounding
        # (contraction dim is only 8, so f32 here is nearly free)
        logk = jax.lax.dot_general(
            aq, bk_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # [Bq, BK]
        k = jnp.exp(logk)
        # the value matmul tolerates MXU default precision (k in [0,1],
        # messages are normalized downstream); f32 here would cost 8x MXU rate
        return acc + jax.lax.dot_general(
            k, zs, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [Bq, C]

    out_ref[:] = jax.lax.fori_loop(0, n // _BK, body,
                                   jnp.zeros((bq, c), jnp.float32))


@functools.partial(jax.jit, static_argnames=("block_q",))
def bilateral_message_pallas(feats: jnp.ndarray, values: jnp.ndarray,
                             block_q: int = 256) -> jnp.ndarray:
    """K @ values for the Gaussian kernel of ``feats`` (already /sigma).

    feats: [N, F], values: [N, C]. Returns [N, C] float32.
    """
    n, f = feats.shape
    c = values.shape[1]
    n_pad = (-n) % max(block_q, _BK)
    n_tot = n + n_pad
    f_aug = f + 2
    f_pad = (-f_aug) % 8
    c_pad = (-c) % 8

    feats = feats.astype(jnp.float32)
    sq = jnp.sum(feats * feats, axis=1)
    a = jnp.concatenate([feats, -0.5 * sq[:, None],
                         jnp.ones((n, 1), jnp.float32)], axis=1)
    b = jnp.concatenate([feats, jnp.ones((n, 1), jnp.float32),
                         -0.5 * sq[:, None]], axis=1)
    a = jnp.pad(a, ((0, n_pad), (0, f_pad)))
    b = jnp.pad(b, ((0, n_pad), (0, f_pad)))
    if n_pad:
        # padded keys: norm slot -> -1e30 so exp(logk) == 0
        b = b.at[n:, f + 1].set(-1e30)

    a_t = a.T  # [F', Ntot]
    b_t = b.T
    values_t = jnp.pad(values.astype(jnp.float32),
                       ((0, n_pad), (0, c_pad))).T  # [C', Ntot]

    fdim = a_t.shape[0]
    cdim = values_t.shape[0]
    out = pl.pallas_call(
        _kernel,
        grid=(n_tot // block_q,),
        in_specs=[
            pl.BlockSpec((fdim, block_q), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((fdim, n_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cdim, n_tot), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_q, cdim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tot, cdim), jnp.float32),
    )(a_t, b_t, values_t)
    return out[:n, :c]


def pallas_supported(n: int, c: int) -> bool:
    """VMEM budget: transposed feats (x2) + values must fit comfortably."""
    n_tot = n + ((-n) % _BK)
    c_pad = c + ((-c) % 8)
    bytes_needed = (2 * 8 + c_pad) * n_tot * 4
    return bytes_needed < 10 * 1024 * 1024
