"""BEiT-Large backbone (the encoder of MiDaS DPT_BEiT_L_384), functional JAX.

Architecture per the public timm ``beit_large_patch16_384`` + MiDaS 3.1's
arbitrary-resolution adaptation (the reference consumes it through torch.hub,
``src/zoedepth/models/base_models/midas.py:333-340``):

* patch-16 embedding, cls token, NO absolute position embedding;
* 24 pre-norm blocks with LayerScale (gamma_1/gamma_2) and decomposed qkv
  bias (q_bias, zero k bias, v_bias);
* per-block relative position bias over the (patches + cls) window: a learned
  table of (2H-1)(2W-1)+3 entries; for input windows different from the 24x24
  pretrain grid the 2-D part of the table is bicubically resized (MiDaS's
  trick), the 3 cls-special entries are kept.

TPU notes: patch embed = reshape + GEMM; the bias table resize and index
matrices are static per input shape (computed at trace time); hook taps are
plain return values instead of forward hooks.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from depthg_tpu.models.layers import layer_norm, layer_norm_init, linear
from depthg_tpu.models.vit import trunc_normal_init
from depthg_tpu.ops.resize import resize_bicubic


@dataclasses.dataclass(frozen=True)
class BEiTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6
    pretrain_window: int = 24  # 384 / 16
    hooks: tuple = (5, 11, 17, 23)
    layer_scale_init: float = 1e-5
    # "xla" (einsum softmax, parity default) | "fused" (whole-KV Pallas
    # kernel with the rel-pos bias added in VMEM — the [N, N] logits never
    # touch HBM) | "auto" (fused on TPU, xla elsewhere)
    attn_impl: str = "xla"


def beit_init(key: jax.Array, cfg: BEiTConfig, dtype=jnp.float32) -> dict:
    d = cfg.embed_dim
    hidden = int(d * cfg.mlp_ratio)
    w0 = cfg.pretrain_window
    n_rel = (2 * w0 - 1) ** 2 + 3
    keys = iter(jax.random.split(key, 3 + 6 * cfg.depth))
    params = {
        "patch_embed": {"w": trunc_normal_init(next(keys), (3 * cfg.patch_size ** 2, d), dtype=dtype),
                        "b": jnp.zeros((d,), dtype)},
        "cls_token": trunc_normal_init(next(keys), (1, 1, d), dtype=dtype),
        "blocks": [],
    }
    for _ in range(cfg.depth):
        params["blocks"].append({
            "norm1": layer_norm_init(d, dtype),
            "qkv_w": trunc_normal_init(next(keys), (d, 3 * d), dtype=dtype),
            "q_bias": jnp.zeros((d,), dtype),
            "v_bias": jnp.zeros((d,), dtype),
            "proj": {"w": trunc_normal_init(next(keys), (d, d), dtype=dtype),
                     "b": jnp.zeros((d,), dtype)},
            "norm2": layer_norm_init(d, dtype),
            "fc1": {"w": trunc_normal_init(next(keys), (d, hidden), dtype=dtype),
                    "b": jnp.zeros((hidden,), dtype)},
            "fc2": {"w": trunc_normal_init(next(keys), (hidden, d), dtype=dtype),
                    "b": jnp.zeros((d,), dtype)},
            "gamma_1": jnp.full((d,), cfg.layer_scale_init, dtype),
            "gamma_2": jnp.full((d,), cfg.layer_scale_init, dtype),
            "rel_pos_table": trunc_normal_init(next(keys), (n_rel, cfg.num_heads), dtype=dtype),
        })
    return params


def quantize_beit_params(params: dict) -> dict:
    """int8 (w8a8) BEiT tree, mirroring ``models/vit.py:quantize_vit_params``:
    every block linear (packed qkv / proj / fc1 / fc2 — all the MXU flops)
    becomes a ``quantize_linear_params`` dict; norms, LayerScale gammas, the
    rel-pos table, and embeddings are cast to bf16. The decomposed qkv bias
    (q_bias, zero k, v_bias — timm BEiT) folds into the quantized linear's
    f32 bias. ``_block`` detects the packed "qkv" key."""
    from depthg_tpu.models.layers import cast_tree_bf16 as bf16
    from depthg_tpu.models.layers import quantize_linear_params

    out = {k: bf16(v) for k, v in params.items() if k != "blocks"}
    out["blocks"] = []
    for blk in params["blocks"]:
        qb = blk["q_bias"]
        qkv_b = jnp.concatenate([qb, jnp.zeros_like(qb), blk["v_bias"]])
        out["blocks"].append({
            "norm1": bf16(blk["norm1"]), "norm2": bf16(blk["norm2"]),
            "gamma_1": blk["gamma_1"].astype(jnp.bfloat16),
            "gamma_2": blk["gamma_2"].astype(jnp.bfloat16),
            "rel_pos_table": blk["rel_pos_table"].astype(jnp.bfloat16),
            "qkv": quantize_linear_params({"w": blk["qkv_w"], "b": qkv_b}),
            "proj": quantize_linear_params(blk["proj"]),
            "fc1": quantize_linear_params(blk["fc1"]),
            "fc2": quantize_linear_params(blk["fc2"]),
        })
    return out


@functools.lru_cache(maxsize=None)
def relative_position_index(h: int, w: int) -> np.ndarray:
    """timm BEiT relative_position_index for an (h*w + 1)-token window."""
    num_rel = (2 * h - 1) * (2 * w - 1)
    coords = np.stack(np.meshgrid(np.arange(h), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += h - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    n = h * w
    idx = np.zeros((n + 1, n + 1), np.int64)
    idx[1:, 1:] = rel.sum(-1)
    # timm order: the 3 special entries at the END of the table are
    # (cls-to-token, token-to-cls, cls-to-cls)
    idx[0, 0:] = num_rel
    idx[0:, 0] = num_rel + 1
    idx[0, 0] = num_rel + 2
    return idx


def _rel_pos_bias(table: jnp.ndarray, cfg: BEiTConfig, h: int, w: int) -> jnp.ndarray:
    """[heads, N+1, N+1] bias for an h x w patch window, resizing the table
    if the window differs from pretraining (MiDaS arbitrary-res trick)."""
    w0 = cfg.pretrain_window
    if (h, w) != (w0, w0):
        grid = table[:-3].reshape(2 * w0 - 1, 2 * w0 - 1, -1)
        grid = jnp.transpose(grid, (2, 0, 1))[None]  # [1, heads, 47, 47]
        grid = resize_bicubic(grid.astype(jnp.float32), (2 * h - 1, 2 * w - 1))[0]
        grid = jnp.transpose(grid, (1, 2, 0)).reshape(-1, table.shape[-1])
        table = jnp.concatenate([grid.astype(table.dtype), table[-3:]], axis=0)
    idx = jnp.asarray(relative_position_index(h, w))
    bias = table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], -1)
    return jnp.transpose(bias, (2, 0, 1))


def _fused_ok(n: int, nh: int, d: int) -> bool:
    from depthg_tpu.ops.attention import whole_kv_seq_ok
    return n % 128 == 0 and d % nh == 0 and whole_kv_seq_ok(n, d // nh)


def _block(p: dict, x: jnp.ndarray, cfg: BEiTConfig, h: int, w: int,
           fused: bool = False, n_valid: int | None = None) -> jnp.ndarray:
    b, n, d = x.shape
    nh = cfg.num_heads
    hd = d // nh
    scale = hd ** -0.5

    y = layer_norm(p["norm1"], x, cfg.ln_eps)
    if "qkv" in p:  # int8 tree: packed w8a8 projection, bias folded in
        qkv_flat = linear(p["qkv"], y)  # [B, N, 3D]
    else:
        qkv_bias = jnp.concatenate([p["q_bias"], jnp.zeros_like(p["q_bias"]),
                                    p["v_bias"]])
        qkv_flat = y @ p["qkv_w"] + qkv_bias  # [B, N, 3D]
    bias = _rel_pos_bias(p["rel_pos_table"], cfg, h, w)  # [nh, N', N']
    if fused and _fused_ok(n, nh, d):
        from depthg_tpu.ops.attention import (qkv_packed_ok, whole_kv_mha,
                                              whole_kv_mha_qkv)
        if bias.shape[-1] != n:  # stack padded to a lane multiple: the
            # kernel's n_valid mask ignores padded rows/cols, so zero-pad
            pn = n - bias.shape[-1]
            bias = jnp.pad(bias, ((0, 0), (0, pn), (0, pn)))
        if qkv_packed_ok(nh, d):  # BEiT-L: hd=64, 16 heads, D=1024
            out = whole_kv_mha_qkv(qkv_flat, nh, scale, n_valid, bias=bias)
        else:
            qkv5 = jnp.transpose(qkv_flat.reshape(b, n, 3, nh, hd),
                                 (2, 0, 3, 1, 4))
            o = whole_kv_mha(qkv5[0], qkv5[1], qkv5[2], scale, n_valid,
                             bias=bias)
            out = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, d)
    else:
        qkv = jnp.transpose(qkv_flat.reshape(b, n, 3, nh, hd), (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + bias[None].astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = jnp.transpose(o, (0, 2, 1, 3)).reshape(b, n, d)
    out = linear(p["proj"], out)
    x = x + p["gamma_1"] * out

    y = layer_norm(p["norm2"], x, cfg.ln_eps)
    y = linear(p["fc2"], jax.nn.gelu(linear(p["fc1"], y), approximate=False))
    return x + p["gamma_2"] * y


def beit_forward(params: dict, x: jnp.ndarray, cfg: BEiTConfig):
    """x: [B, 3, H, W] (H, W multiples of 16) -> list of hook-tap token
    tensors [B, 1+N, D] at ``cfg.hooks`` block outputs.

    ``cfg.attn_impl="fused"`` routes attention through the whole-KV Pallas
    kernel (rel-pos bias added to the logits in VMEM): the token axis is
    padded ONCE to a lane multiple for the whole 24-block stack — padded
    keys get probability exactly 0 via the kernel's ``n_valid`` mask, and
    every other op (LN, MLP, LayerScale) is per-token, so pad rows never
    contaminate real tokens. Taps are sliced back to the real length."""
    b, _, hh, ww = x.shape
    ps = cfg.patch_size
    h, w = hh // ps, ww // ps
    xr = x.reshape(b, 3, h, ps, w, ps)
    tok = jnp.transpose(xr, (0, 2, 4, 1, 3, 5)).reshape(b, h * w, 3 * ps * ps)
    tok = tok @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"].astype(tok.dtype), (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)

    impl = cfg.attn_impl
    if impl == "auto":
        impl = "fused" if jax.default_backend() == "tpu" else "xla"
    n_tok = tok.shape[1]
    npad = -(-n_tok // 128) * 128
    fused = impl == "fused" and _fused_ok(npad, cfg.num_heads, cfg.embed_dim)
    n_valid = None
    if fused and npad != n_tok:
        n_valid = n_tok
        tok = jnp.pad(tok, ((0, 0), (0, npad - n_tok), (0, 0)))

    taps = []
    for i, blk in enumerate(params["blocks"]):
        tok = _block(blk, tok, cfg, h, w, fused=fused, n_valid=n_valid)
        if i in cfg.hooks:
            taps.append(tok[:, :n_tok])
    return taps, (h, w)
