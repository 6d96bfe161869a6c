"""Whole-KV fused multi-head attention (Pallas TPU kernel).

A specialization of flash attention for the shapes this framework actually
runs: non-causal ViT self-attention at sequence lengths where the ENTIRE
key/value set fits VMEM (ViT-S/8 grids are <=1601 tokens; the [block_q, N]
f32 logits tile is the binding footprint, not KV). At these sizes the
generic flash kernel's online-softmax machinery — running max/sum carries
and a rescale multiply of the [bq, hd] accumulator per KV block — is pure
overhead: with one KV block there is nothing to rescale. This kernel does
the textbook softmax once per query block:

    s = (q * scale) @ k^T        (MXU, f32 accumulation)
    e = exp(s - rowmax(s))       (VPU)
    o = (e @ v) / rowsum(e)      (MXU; the divide is applied to the
                                  [bq, hd] OUTPUT, 26x fewer elements than
                                  normalizing the [bq, N] probability matrix)

Padded tokens (the caller pads N up to a lane multiple once for the whole
ViT stack, ``models/vit.py:246-258``) are masked with a compile-time iota
compare — padded KEYS get probability exactly 0, padded QUERY rows emit
exactly 0 (the row sum is clamped), matching the flash segment-id contract.

Reference behavior target: torch ``F.softmax(q @ k^T) @ v`` inside DINO's
Attention (reference ``dino/vision_transformer.py:83-97``); bit-level parity
is checked against the XLA path in ``tests/test_attention_kernel.py``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 bytes the [block_q, N] logits + exp tiles may occupy together; the
# rest of VMEM is left to Mosaic for double-buffered q/k/v/o blocks.
_VMEM_LOGITS_BUDGET = 8 * 2 ** 20


def _whole_kv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                     n_valid: int, out_dtype):
    q = q_ref[0, 0].astype(jnp.float32) * scale          # [bq, hd]
    k = k_ref[0, 0]                                      # [n, hd]
    s = jax.lax.dot_general(q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, n]
    if n_valid < s.shape[1]:
        keep = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < n_valid
        s = jnp.where(keep, s, -1e30)
    e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    l = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0, 0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, hd]
    o = o / l
    if n_valid < s.shape[1]:
        # zero the padded QUERY rows too (they softmax over valid keys
        # above); the row index is global — this is the qb-th q block
        row = (pl.program_id(2) * s.shape[0]
               + jax.lax.broadcasted_iota(jnp.int32, o.shape, 0))
        o = jnp.where(row < n_valid, o, 0.0)
    o_ref[0, 0] = o.astype(out_dtype)


def _pick_block_q(npad: int) -> int:
    """Largest divisor of ``npad`` (multiple of the f32 sublane 8) whose two
    [bq, npad] f32 VPU tiles fit the logits budget."""
    cap = max(8, _VMEM_LOGITS_BUDGET // (2 * 4 * npad) // 8 * 8)
    for bq in range(min(npad, cap), 7, -8):
        if npad % bq == 0:
            return bq
    return 8


def whole_kv_seq_ok(n: int) -> bool:
    """Shapes this kernel accepts: one [8, N] f32 logits row-block must fit
    the budget (same ~22k-token ceiling class as ``models/vit.py``'s flash
    guard; ViT grids are far below it)."""
    npad = -(-n // 128) * 128
    return 2 * 4 * 8 * npad <= _VMEM_LOGITS_BUDGET


def _whole_kv_qkv_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                         n_valid: int, out_dtype):
    """Same math as ``_whole_kv_kernel`` over rank-3 [1, rows, hd] blocks
    sliced straight out of the packed [B, N, 3D] qkv tensor."""
    q = q_ref[0].astype(jnp.float32) * scale             # [bq, hd]
    k = k_ref[0]                                         # [n, hd]
    s = jax.lax.dot_general(q.astype(k.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, n]
    if n_valid < s.shape[1]:
        keep = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < n_valid
        s = jnp.where(keep, s, -1e30)
    e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    l = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(e.astype(v_ref.dtype), v_ref[0],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o / l
    if n_valid < s.shape[1]:
        row = (pl.program_id(2) * s.shape[0]
               + jax.lax.broadcasted_iota(jnp.int32, o.shape, 0))
        o = jnp.where(row < n_valid, o, 0.0)
    o_ref[0] = o.astype(out_dtype)


def whole_kv_mha_qkv(qkv: jnp.ndarray, num_heads: int, scale: float,
                     n_valid: int | None = None, block_q: int | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Whole-KV attention straight from the packed qkv projection.

    ``qkv``: [B, N, 3D] — the raw output of the ViT's fused qkv linear,
    whose last axis factors as (3, heads, head_dim) — and returns the
    attention output already in [B, N, D] token-major layout. Compared to
    ``whole_kv_mha`` this skips BOTH the [B,N,3D] -> [3,B,h,N,hd] operand
    relayout and the [B,h,N,hd] -> [B,N,D] output relayout (real HBM copies
    when they feed/come from a Pallas kernel: ~0.2 ms/layer at the eval
    shape) — the per-head slices become strided DMA block fetches instead.
    Semantics identical to ``whole_kv_mha`` (padded keys weight exactly 0,
    padded query rows exactly 0).
    """
    b, n, d3 = qkv.shape
    if d3 % (3 * num_heads):
        raise ValueError(f"qkv last dim {d3} not divisible by 3*{num_heads}")
    hd = d3 // (3 * num_heads)
    if n % 128:
        raise ValueError(f"whole_kv_mha_qkv needs a lane-multiple sequence, got {n}")
    nv = int(n if n_valid is None else n_valid)
    bq = block_q or _pick_block_q(n)
    if n % bq:
        raise ValueError(f"block_q={bq} must divide N={n}")
    kernel = functools.partial(_whole_kv_qkv_kernel, scale=float(scale),
                               n_valid=nv, out_dtype=qkv.dtype)
    nh = num_heads
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, nh * hd), qkv.dtype),
        grid=(b, nh, n // bq),
        in_specs=[
            pl.BlockSpec((1, bq, hd), lambda i, j, qb: (i, qb, j)),
            pl.BlockSpec((1, n, hd), lambda i, j, qb, nh=nh: (i, 0, nh + j)),
            pl.BlockSpec((1, n, hd), lambda i, j, qb, nh=nh: (i, 0, 2 * nh + j)),
        ],
        out_specs=pl.BlockSpec((1, bq, hd), lambda i, j, qb: (i, qb, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(qkv, qkv, qkv)


def whole_kv_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                 n_valid: int | None = None, block_q: int | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Self-attention over [B, H, N, HD] with the whole KV resident in VMEM.

    ``N`` must be a lane multiple (128); ``n_valid`` marks the real tokens
    (static int — the ViT pads once for the whole stack, so it is a trace
    constant). Returns [B, H, N, HD] in ``q.dtype``; padded query rows are
    exactly 0 and padded keys receive probability exactly 0.
    """
    b, h, n, hd = q.shape
    if n % 128:
        raise ValueError(f"whole_kv_mha needs a lane-multiple sequence, got {n}")
    nv = int(n if n_valid is None else n_valid)
    bq = block_q or _pick_block_q(n)
    if n % bq:
        raise ValueError(f"block_q={bq} must divide N={n}")
    kernel = functools.partial(_whole_kv_kernel, scale=float(scale),
                               n_valid=nv, out_dtype=q.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),
        grid=(b, h, n // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, hd), lambda i, j, qb: (i, j, qb, 0)),
            pl.BlockSpec((1, 1, n, hd), lambda i, j, qb: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, n, hd), lambda i, j, qb: (i, j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, hd), lambda i, j, qb: (i, j, qb, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)
