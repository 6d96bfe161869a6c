"""DINO Vision Transformer backbone, functional JAX implementation.

Re-implements the math of the reference's vendored DINO ViT
(``src/dino/vision_transformer.py``) TPU-first:

* patch embedding is expressed as patch-extract + one big matmul (stride ==
  kernel, so the conv is exactly a reshape + GEMM on the MXU),
* blocks are plain pure functions over a param pytree; the backbone is frozen
  in this framework, so the whole stack runs under ``stop_gradient`` in bf16
  or f32 as configured,
* ``interpolate_pos_encoding`` reproduces the reference's bicubic
  scale-factor quirk (``vision_transformer.py:179-199``: scale =
  (w//ps + 0.1)/sqrt(N), H axis scaled by the *width* factor).

``vit_apply(..., n=k)`` mirrors ``get_intermediate_feat``
(``vision_transformer.py:228-240``): post-norm tokens, attention maps and the
raw qkv tensors of the last ``n`` blocks.
"""

from __future__ import annotations

import contextlib
import dataclasses
import math

import jax
import jax.numpy as jnp


def matmul_precision(precision: str | None):
    """Context scoping all dots/einsums: None = backend default (bf16 on TPU MXU),
    or an explicit mode like "float32" for parity-critical paths."""
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(precision)

from depthg_tpu.models.layers import layer_norm, layer_norm_init, linear, trunc_normal_init, vit_linear_init
from depthg_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 8
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    ln_eps: float = 1e-6
    img_size: int = 224  # only fixes the *size of the learned pos_embed table*


VIT_PRESETS = {
    "vit_tiny": dict(embed_dim=192, depth=12, num_heads=3),
    "vit_small": dict(embed_dim=384, depth=12, num_heads=6),
    "vit_base": dict(embed_dim=768, depth=12, num_heads=12),
}


def make_config(arch: str, patch_size: int) -> ViTConfig:
    return ViTConfig(patch_size=patch_size, **VIT_PRESETS[arch])


def vit_init(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> dict:
    n_side = cfg.img_size // cfg.patch_size
    n_tok = n_side * n_side + 1
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)
    keys = iter(jax.random.split(key, 4 + 4 * cfg.depth))

    params = {
        "patch_embed": {
            # [3*ps*ps, D] in (c, kh, kw) flatten order, matching torch conv weight layout
            "w": trunc_normal_init(next(keys), (3 * cfg.patch_size**2, d), dtype=dtype),
            "b": jnp.zeros((d,), dtype),
        },
        "cls_token": trunc_normal_init(next(keys), (1, 1, d), dtype=dtype),
        "pos_embed": trunc_normal_init(next(keys), (1, n_tok, d), dtype=dtype),
        "norm": layer_norm_init(d, dtype),
        "blocks": [],
    }
    for _ in range(cfg.depth):
        params["blocks"].append({
            "norm1": layer_norm_init(d, dtype),
            "qkv": vit_linear_init(next(keys), d, 3 * d, dtype),
            "proj": vit_linear_init(next(keys), d, d, dtype),
            "norm2": layer_norm_init(d, dtype),
            "fc1": vit_linear_init(next(keys), d, hidden, dtype),
            "fc2": vit_linear_init(next(keys), hidden, d, dtype),
        })
    return params


def _patchify(x: jnp.ndarray, ps: int) -> jnp.ndarray:
    """[B, 3, H, W] -> [B, Hp*Wp, 3*ps*ps] tokens, row-major, (c, kh, kw) order."""
    b, c, h, w = x.shape
    hp, wp = h // ps, w // ps
    x = x.reshape(b, c, hp, ps, wp, ps)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5))
    return x.reshape(b, hp * wp, c * ps * ps)


def interpolate_pos_encoding(pos_embed: jnp.ndarray, npatch: int, w: int, h: int, ps: int) -> jnp.ndarray:
    """Bicubic pos-embed resize for arbitrary input (reference
    ``vision_transformer.py:179-199``). The reference swaps the names w/h
    twice (prepare_tokens unpacks B,nc,w,h), which cancels out: the H axis is
    scaled by the H-derived factor. ``w``/``h`` here are the true image width
    and height; only the +0.1 fudge quirk remains."""
    n = pos_embed.shape[1] - 1
    if npatch == n and w == h:
        return pos_embed
    dim = pos_embed.shape[-1]
    side = int(math.sqrt(n))
    cls_pos = pos_embed[:, :1]
    patch_pos = pos_embed[:, 1:].reshape(1, side, side, dim).transpose(0, 3, 1, 2)
    h0 = h // ps + 0.1
    w0 = w // ps + 0.1
    sf = (h0 / side, w0 / side)  # (H-axis, W-axis) scale factors
    out_hw = (int(side * sf[0]), int(side * sf[1]))
    patch_pos = resize_bicubic(patch_pos, out_hw, scale=sf)
    patch_pos = patch_pos.transpose(0, 2, 3, 1).reshape(1, -1, dim)
    return jnp.concatenate([cls_pos, patch_pos], axis=1)


def quantize_vit_params(params: dict) -> dict:
    """int8 (w8a8) backbone tree: every block linear (qkv/proj/fc1/fc2 — all
    the MXU flops) becomes a ``quantize_linear_params`` dict; everything else
    (embeddings, layer norms, final norm) is cast to bf16. The attention
    softmax and the GELU stay bf16 — only the matmuls run int8, at 2x the
    MXU's bf16 peak (v5e: 394 vs 197 TFLOP/s)."""
    from depthg_tpu.models.layers import cast_tree_bf16 as bf16
    from depthg_tpu.models.layers import quantize_linear_params

    out = {k: bf16(v) for k, v in params.items() if k != "blocks"}
    out["blocks"] = [
        {"norm1": bf16(blk["norm1"]), "norm2": bf16(blk["norm2"]),
         "qkv": quantize_linear_params(blk["qkv"]),
         "proj": quantize_linear_params(blk["proj"]),
         "fc1": quantize_linear_params(blk["fc1"]),
         "fc2": quantize_linear_params(blk["fc2"])}
        for blk in params["blocks"]]
    return out


def _whole_kv_ok(n: int, head_dim: int) -> bool:
    from depthg_tpu.ops.attention import whole_kv_seq_ok
    return whole_kv_seq_ok(n, head_dim)


def _flash_seq_ok(n: int) -> bool:
    """Whether ``_flash_mha``'s blocking scheme fits VMEM at this sequence
    length. The kernel keeps the whole KV resident (block_k = seq), so the
    [block_q, seq] f32 logits tile needs block_q >= 128 within the ~11.5 MB
    budget — beyond ~22k tokens that fails and the caller must take the XLA
    path (ViT grids here are <=1601 tokens; this is a guard, not a path)."""
    npad = -(-n // 128) * 128
    return npad * 4 * 128 <= 11.5e6


def _flash_mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float,
               n_valid: int | None = None) -> jnp.ndarray:
    """Fused flash attention (Pallas TPU kernel): the [N, N] softmax matrix
    never touches HBM. At eval shapes (N=1601, B=16) the XLA path writes
    ~3 GB of attention intermediates per layer; this kernel streams them
    through VMEM. The sequence must be a lane multiple — ``vit_apply`` pads
    the token axis ONCE for the whole stack (cheaper than pad/unpad around
    every layer); ``n_valid`` marks the real tokens, masked via segment ids
    (padded keys get weight exactly 0)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, h, n, hd = q.shape
    npad = -(-n // 128) * 128
    if npad != n:
        pad = ((0, 0), (0, 0), (0, npad - n), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    nv = n if n_valid is None else n_valid
    seg = (jnp.arange(npad) < nv).astype(jnp.int32)[None].repeat(b, 0)
    # measured on v5e @ N=1664 (batch 16, h=6, hd=64): one whole-sequence
    # program per (b, h) — block_q = block_k = seq — runs the attention in
    # 1.2 ms vs 2.6 ms for q-block 128 and 10 ms for the splash kernel; the
    # [seq, seq] f32 logits tile (11 MB at 1664) still fits VMEM. Above
    # that, fall back to q-blocking with the whole KV resident (the [bq,
    # seq] tile is what must fit).
    if npad * npad * 4 <= 11.5e6:
        block_q = npad
    else:
        budget = int(11.5e6 / (npad * 4)) // 128 * 128
        block_q = max((bq for bq in (512, 256, 128) if npad % bq == 0
                       and bq <= budget), default=128)
    sizes = fa.BlockSizes(block_q=block_q, block_k_major=npad,
                          block_k=npad, block_b=1)
    out = fa.flash_attention(q, k, v, segment_ids=fa.SegmentIds(q=seg, kv=seg),
                             sm_scale=scale, block_sizes=sizes)
    return out[:, :, :n, :]


def _attention(p: dict, x: jnp.ndarray, cfg: ViTConfig, impl: str = "xla",
               n_valid: int | None = None):
    b, n, d = x.shape
    hd = d // cfg.num_heads
    qkv_flat = linear(p["qkv"], x)  # [B, N, 3D]
    scale = hd ** -0.5
    if impl == "fused" and n % 128 == 0 and _whole_kv_ok(n, hd):
        # (non-lane-multiple sequences — callers that skip vit_apply's
        # once-per-stack padding, e.g. the MiDaS tap path — fall through to
        # flash, which pads internally)
        from depthg_tpu.ops.attention import (qkv_packed_ok, whole_kv_mha,
                                              whole_kv_mha_qkv)
        # The 5D qkv below is built only for the return contract; XLA
        # dead-code-eliminates it in every block whose qkv the caller
        # doesn't collect (vit_apply keeps only the last n).
        qkv = jnp.transpose(qkv_flat.reshape(b, n, 3, cfg.num_heads, hd),
                            (2, 0, 3, 1, 4))
        if qkv_packed_ok(cfg.num_heads, d):
            # head-pair blocks sliced straight out of the packed qkv,
            # output written token-major [B, N, D]: neither per-layer
            # relayout ever materializes on this path
            out_flat = whole_kv_mha_qkv(qkv_flat, cfg.num_heads, scale,
                                        n_valid)
        else:  # e.g. vit_tiny (3 heads, D=192): split operands, full-dim
            # head_dim minor blocks are always tile-legal
            out = whole_kv_mha(qkv[0], qkv[1], qkv[2], scale, n_valid)
            out_flat = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, d)
        return linear(p["proj"], out_flat), None, qkv
    qkv = qkv_flat.reshape(b, n, 3, cfg.num_heads, hd)
    qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))  # [3, B, h, N, hd]
    q, k, v = qkv[0], qkv[1], qkv[2]
    if impl in ("flash", "fused") and _flash_seq_ok(n):
        out = _flash_mha(q, k, v, scale, n_valid)
        attn = None  # flash never materializes the attention matrix
    else:
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, n, d)
    return linear(p["proj"], out), attn, qkv


def _block(p: dict, x: jnp.ndarray, cfg: ViTConfig, impl: str = "xla",
           n_valid: int | None = None):
    y, attn, qkv = _attention(p, layer_norm(p["norm1"], x, cfg.ln_eps), cfg,
                              impl, n_valid)
    x = x + y
    h = layer_norm(p["norm2"], x, cfg.ln_eps)
    # torch nn.GELU is erf-exact; in bf16 the tanh approximation's error
    # (<3e-3 abs) is below the bf16 quantization step and erf costs ~20% of
    # the whole forward on the VPU (measured v5e, batch 16 @320px), so bf16
    # activations take the approximate path. f32 (parity) keeps exact erf.
    h = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], h),
                                     approximate=h.dtype == jnp.bfloat16))
    return x + h, attn, qkv


def prepare_tokens(params: dict, x: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    b, _, h, w = x.shape
    tok = _patchify(x, cfg.patch_size) @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype), (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    pos = interpolate_pos_encoding(params["pos_embed"], tok.shape[1] - 1, w, h, cfg.patch_size)
    return tok + pos.astype(tok.dtype)


def resolve_attn_impl(impl: str, need_attn: bool, precision: str | None) -> str:
    """"auto" -> "flash" on TPU when the attention *matrix* isn't consumed and
    no explicit (parity) matmul precision is requested; "xla" otherwise. Flash
    cannot return attn maps, so callers that need them (LHP attn propagation,
    golden tests) keep the einsum path."""
    if impl != "auto":
        if impl in ("flash", "fused") and need_attn:
            raise ValueError(
                f"attention_impl='{impl}' cannot return attention maps, but "
                "this configuration consumes them (LHP attn propagation) — "
                "use 'auto' or 'xla'")
        return impl
    if need_attn or precision is not None:
        return "xla"
    return "flash" if jax.default_backend() == "tpu" else "xla"


def vit_apply(params: dict, x: jnp.ndarray, cfg: ViTConfig, n: int = 1,
              precision: str | None = None, attn_impl: str = "xla"):
    """Forward through all blocks; collect (normed tokens, attn, qkv) of last n blocks.

    Returns (feats, attns, qkvs) — lists of length n, mirroring the reference's
    ``get_intermediate_feat``. The backbone is frozen: wrap the call site in
    ``jax.lax.stop_gradient`` (the featurizer does this).

    ``precision``: None = MXU default (bf16 inputs, f32 accumulate) for speed;
    "float32" for bit-parity with the torch reference.
    ``attn_impl``: "xla" | "flash" | "fused" (attn entries are None under
    the fused kernels; "fused" = ops/attention.py's whole-KV softmax).
    """
    with matmul_precision(precision):
        x = prepare_tokens(params, x, cfg)
        n_tok = x.shape[1]
        n_valid = None
        if attn_impl in ("flash", "fused") and n_tok % 128:
            # pad the token axis ONCE for the whole stack instead of
            # pad/unpad around every flash call (~1 ms/pass of pure copies
            # at eval shapes). Padded tokens carry zeros; the flash segment
            # mask gives them zero weight as keys, and every per-token op
            # (layer norm, MLP) is independent across tokens, so they never
            # contaminate real tokens. Sliced off before returning.
            n_valid = n_tok
            x = jnp.pad(x, ((0, 0), (0, (-n_tok) % 128), (0, 0)))
        feats, attns, qkvs = [], [], []
        depth = len(params["blocks"])
        for i, blk in enumerate(params["blocks"]):
            x, attn, qkv = _block(blk, x, cfg, attn_impl, n_valid)
            if depth - i <= n:
                feats.append(layer_norm(params["norm"], x, cfg.ln_eps)[:, :n_tok])
                attns.append(attn)
                qkvs.append(qkv if n_valid is None else qkv[..., :n_tok, :])
        return feats, attns, qkvs
