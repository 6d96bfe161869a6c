"""Whole-KV fused multi-head attention (Pallas TPU kernels).

A specialization of flash attention for the shapes this framework actually
runs: non-causal ViT self-attention at sequence lengths where the ENTIRE
key/value set fits VMEM (ViT-S/8 grids are <=1601 tokens; the [block_q, N]
f32 logits tile is the binding footprint, not KV). At these sizes the
generic flash kernel's online-softmax machinery — running max/sum carries
and a rescale multiply of the [bq, hd] accumulator per KV block — is pure
overhead: with one KV block there is nothing to rescale. The kernels do
the textbook softmax once per query block:

    s = (q * scale) @ k^T        (MXU, f32 accumulation)
    e = exp(s - rowmax(s))       (VPU)
    o = (e @ v) / rowsum(e)      (MXU; the divide is applied to the
                                  [bq, hd] OUTPUT, 26x fewer elements than
                                  normalizing the [bq, N] probability matrix)

Two entry points:

* ``whole_kv_mha`` — split [B, H, N, HD] operands (head_dim is the FULL
  minor dimension, so every block is trivially tile-legal).
* ``whole_kv_mha_qkv`` — reads q/k/v straight out of the packed [B, N, 3D]
  qkv-projection output and writes token-major [B, N, D], skipping both
  per-layer relayouts. Blocks on the packed axis must be 128-lane tiles,
  so the kernel fetches PAIRS of 64-wide heads per program and splits them
  in VMEM; ``qkv_packed_ok`` gates the configs where that factoring holds
  (head_dim 64, even head count, D % 128 == 0 — all standard ViTs except
  vit_tiny, which takes the split path).

Padded tokens (the caller pads N up to a lane multiple once for the whole
ViT stack, ``models/vit.py``) are masked with a compile-time iota
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


def _attend(q, k, v, scale: float, n_valid: int, row0, out_dtype, bias=None):
    """The shared whole-KV softmax-attention math on loaded VMEM values:
    q [bq, hd], k/v [n, hd] -> [bq, hd]. ``row0`` = global index of the
    first query row in this block (for exact-zero padded-row masking).
    ``bias`` (optional [bq, n], any float dtype) is added to the scaled
    logits — the relative-position-bias contract of BEiT attention."""
    qf = q.astype(jnp.float32) * scale
    s = jax.lax.dot_general(qf.astype(k.dtype), k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, n]
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if n_valid < s.shape[1]:
        keep = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) < n_valid
        s = jnp.where(keep, s, -1e30)
    e = jnp.exp(s - jnp.max(s, axis=1, keepdims=True))
    l = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-30)
    o = jax.lax.dot_general(e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [bq, hd]
    o = o / l
    if n_valid < s.shape[1]:
        # zero the padded QUERY rows too (they softmax over valid keys above)
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, o.shape, 0)
        o = jnp.where(row < n_valid, o, 0.0)
    return o.astype(out_dtype)


def _whole_kv_kernel(q_ref, k_ref, v_ref, *rest, scale: float,
                     n_valid: int, out_dtype):
    b_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    row0 = pl.program_id(2) * q_ref.shape[2]
    bias = None if b_ref is None else b_ref[0]
    o_ref[0, 0] = _attend(q_ref[0, 0], k_ref[0, 0], v_ref[0, 0], scale,
                          n_valid, row0, out_dtype, bias=bias)


def _whole_kv_pair_kernel(q_ref, k_ref, v_ref, *rest, scale: float,
                          n_valid: int, hd: int, out_dtype):
    """Two heads per program over 128-lane blocks of the packed qkv tensor:
    q_ref/k_ref/v_ref are [1, rows, 2*hd]; each half is one head. The
    optional bias ref is [2, rows, n] — one [bq, n] logit bias per head."""
    b_ref, o_ref = rest if len(rest) == 2 else (None, rest[0])
    row0 = pl.program_id(2) * q_ref.shape[1]
    q2, k2, v2 = q_ref[0], k_ref[0], v_ref[0]
    halves = [
        _attend(q2[:, h * hd:(h + 1) * hd], k2[:, h * hd:(h + 1) * hd],
                v2[:, h * hd:(h + 1) * hd], scale, n_valid, row0, out_dtype,
                bias=None if b_ref is None else b_ref[h])
        for h in (0, 1)]
    o_ref[0] = jnp.concatenate(halves, axis=1)


def _pick_block_q(npad: int, n_logit_tiles: int = 2) -> int:
    """Largest divisor of ``npad`` (multiple of the f32 sublane 8) whose
    ``n_logit_tiles`` [bq, npad] f32 VPU tiles fit the logits budget."""
    cap = max(8, _VMEM_LOGITS_BUDGET // (n_logit_tiles * 4 * npad) // 8 * 8)
    for bq in range(min(npad, cap), 7, -8):
        if npad % bq == 0:
            return bq
    return 8


def whole_kv_seq_ok(n: int, head_dim: int = 64) -> bool:
    """Whether the whole-KV scheme fits VMEM at this sequence length: the
    resident K+V blocks (f32 worst case) plus one minimal [8, N] f32 logits
    pair must fit the budget — ~20k tokens at head_dim 64, the same ceiling
    class as ``models/vit.py``'s flash guard; ViT grids are far below it."""
    npad = -(-n // 128) * 128
    kv_bytes = 2 * npad * max(head_dim, 128) * 4  # lane-padded worst case
    return kv_bytes + 2 * 4 * 8 * npad <= _VMEM_LOGITS_BUDGET


def qkv_packed_ok(num_heads: int, dim: int) -> bool:
    """Whether ``whole_kv_mha_qkv``'s head-pair blocking applies: 64-wide
    heads pair into exactly one 128-lane tile and every pair's offset within
    the packed [.., 3D] axis is tile-aligned. True for vit_small/base
    (hd=64, even heads, D%128==0); false for vit_tiny (D=192, 3 heads)."""
    return (num_heads > 0 and dim % num_heads == 0
            and dim // num_heads == 64 and num_heads % 2 == 0
            and dim % 128 == 0)


def _validated(n: int, block_q: int | None, n_logit_tiles: int) -> int:
    if n % 128:
        raise ValueError(f"whole-KV attention needs a lane-multiple "
                         f"sequence, got {n}")
    bq = block_q or _pick_block_q(n, n_logit_tiles)
    if n % bq:
        raise ValueError(f"block_q={bq} must divide N={n}")
    return bq


def whole_kv_mha_qkv(qkv: jnp.ndarray, num_heads: int, scale: float,
                     n_valid: int | None = None, block_q: int | None = None,
                     bias: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Whole-KV attention straight from the packed qkv projection.

    ``qkv``: [B, N, 3D] — the raw output of the ViT's fused qkv linear,
    whose last axis factors as (3, heads, head_dim) — returns the attention
    output already in [B, N, D] token-major layout. Compared to
    ``whole_kv_mha`` this skips BOTH the [B,N,3D] -> [3,B,h,N,hd] operand
    relayout and the [B,h,N,hd] -> [B,N,D] output relayout (real HBM copies
    when they feed/come from a Pallas kernel: ~0.2 ms/layer at the eval
    shape). Every fetched block is a 128-lane tile holding a PAIR of heads
    (split in VMEM), so the config must satisfy ``qkv_packed_ok``.
    Semantics identical to ``whole_kv_mha`` (padded keys weight exactly 0,
    padded query rows exactly 0).

    ``bias`` (optional [num_heads, N, N], any float dtype) is added to the
    scaled logits per head — BEiT's relative-position bias. It is batch-
    independent; values at padded rows/columns are ignored (masked), so
    callers may zero-pad it.
    """
    b, n, d3 = qkv.shape
    d = d3 // 3
    if not qkv_packed_ok(num_heads, d) or d3 != 3 * d:
        raise ValueError(
            f"whole_kv_mha_qkv needs qkv_packed_ok heads/dim, got "
            f"num_heads={num_heads}, 3D={d3} — use whole_kv_mha instead")
    hd = d // num_heads
    nv = int(n if n_valid is None else n_valid)
    if bias is not None and bias.shape != (num_heads, n, n):
        raise ValueError(f"bias must be [{num_heads}, {n}, {n}], "
                         f"got {bias.shape}")
    # the pair kernel holds TWO heads' logits+exp tiles at once (+2 bias)
    bq = _validated(n, block_q, n_logit_tiles=4 if bias is None else 6)
    kernel = functools.partial(_whole_kv_pair_kernel, scale=float(scale),
                               n_valid=nv, hd=hd, out_dtype=qkv.dtype)
    dtiles = d // 128  # 128-lane tiles per D; pair j lives at tile j
    in_specs = [
        pl.BlockSpec((1, bq, 128), lambda i, j, qb: (i, qb, j)),
        pl.BlockSpec((1, n, 128),
                     lambda i, j, qb, dt=dtiles: (i, 0, dt + j)),
        pl.BlockSpec((1, n, 128),
                     lambda i, j, qb, dt=dtiles: (i, 0, 2 * dt + j)),
    ]
    operands = [qkv, qkv, qkv]
    if bias is not None:
        in_specs.append(pl.BlockSpec((2, bq, n), lambda i, j, qb: (j, qb, 0)))
        operands.append(bias)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, d), qkv.dtype),
        grid=(b, num_heads // 2, n // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, 128), lambda i, j, qb: (i, qb, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)


def whole_kv_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
                 n_valid: int | None = None, block_q: int | None = None,
                 bias: jnp.ndarray | None = None,
                 interpret: bool = False) -> jnp.ndarray:
    """Self-attention over [B, H, N, HD] with the whole KV resident in VMEM.

    ``N`` must be a lane multiple (128); ``n_valid`` marks the real tokens
    (static int — the ViT pads once for the whole stack, so it is a trace
    constant). Returns [B, H, N, HD] in ``q.dtype``; padded query rows are
    exactly 0 and padded keys receive probability exactly 0. HD is the full
    minor dimension of every block, so any HD is tile-legal.

    ``bias`` (optional [H, N, N], any float dtype) is added to the scaled
    logits per head (BEiT relative-position bias); padded entries are
    ignored under the ``n_valid`` mask.
    """
    b, h, n, hd = q.shape
    nv = int(n if n_valid is None else n_valid)
    if bias is not None and bias.shape != (h, n, n):
        raise ValueError(f"bias must be [{h}, {n}, {n}], got {bias.shape}")
    bq = _validated(n, block_q, n_logit_tiles=2 if bias is None else 3)
    kernel = functools.partial(_whole_kv_kernel, scale=float(scale),
                               n_valid=nv, out_dtype=q.dtype)
    in_specs = [
        pl.BlockSpec((1, 1, bq, hd), lambda i, j, qb: (i, j, qb, 0)),
        pl.BlockSpec((1, 1, n, hd), lambda i, j, qb: (i, j, 0, 0)),
        pl.BlockSpec((1, 1, n, hd), lambda i, j, qb: (i, j, 0, 0)),
    ]
    operands = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, bq, n), lambda i, j, qb: (j, qb, 0)))
        operands.append(bias)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, n, hd), q.dtype),
        grid=(b, h, n // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, bq, hd), lambda i, j, qb: (i, j, qb, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(*operands)
