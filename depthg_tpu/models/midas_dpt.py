"""MiDaS v3 DPT_Large (ViT-L/16 + DPT decoder), functional JAX.

The reference's ``generate_depth.py:94-113`` loads torch.hub
``intel-isl/MiDaS DPT_Large`` for ``--model midas``: a timm ViT-L/16 encoder
(absolute pos-embeds, NO layer-scale/rel-pos — unlike the BEiT backbone of
ZoeDepth) tapped at blocks (5, 11, 17, 23), feeding the same DPT "scratch"
decoder this repo already implements for ZoeDepth (``models/zoedepth/dpt.py``).

Reference behavior preserved exactly:
* images enter RAW (ToTensor 0..1, no resize / no ImageNet normalization) —
  the reference bypasses the hub's dpt_transform (``generate_depth.py:89-110``)
  and calls ``midas(images)`` directly (``generate_depth.py:166``);
* pos-embed resize for arbitrary input is MiDaS's bilinear
  ``_resize_pos_embed`` (align_corners=False) — NOT the DINO bicubic+0.1
  quirk of ``models/vit.py``;
* taps are raw block outputs (the hub hooks fire before the final norm);
* downstream, the depth map is min-max normalized AND inverted
  (``generate_depth.py:190-197``) — done by the generate_depth script.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from depthg_tpu.models import vit as vit_lib
from depthg_tpu.models.zoedepth.dpt import DPTConfig, dpt_forward, dpt_init
from depthg_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class MidasDPTConfig:
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    hooks: tuple = (5, 11, 17, 23)
    img_size: int = 384  # pos-embed table size only; inputs are flexible
    features: int = 256
    reassemble_channels: tuple = (256, 512, 1024, 1024)

    @property
    def vit(self) -> vit_lib.ViTConfig:
        return vit_lib.ViTConfig(patch_size=self.patch_size, embed_dim=self.embed_dim,
                                 depth=self.depth, num_heads=self.num_heads,
                                 img_size=self.img_size)

    @property
    def dpt(self) -> DPTConfig:
        return DPTConfig(embed_dim=self.embed_dim, features=self.features,
                         reassemble_channels=self.reassemble_channels)


def midas_dpt_init(key: jax.Array, cfg: MidasDPTConfig, dtype=jnp.float32) -> dict:
    kv, kd = jax.random.split(key)
    return {"vit": vit_lib.vit_init(kv, cfg.vit, dtype),
            "dpt": dpt_init(kd, cfg.dpt, dtype)}


def _resize_pos_embed(pos: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """MiDaS ``_resize_pos_embed`` (isl-org/MiDaS vit.py): bilinear,
    align_corners=False, cls entry passed through."""
    n = pos.shape[1] - 1
    side = int(round(n ** 0.5))
    if (gh, gw) == (side, side):
        return pos
    cls_pos = pos[:, :1]
    grid = pos[:, 1:].reshape(1, side, side, -1).transpose(0, 3, 1, 2)
    grid = resize_bilinear(grid, (gh, gw))
    grid = grid.transpose(0, 2, 3, 1).reshape(1, gh * gw, -1)
    return jnp.concatenate([cls_pos, grid], axis=1)


def midas_dpt_forward(params: dict, x: jnp.ndarray, cfg: MidasDPTConfig,
                      attn_impl: str = "auto"):
    """x: [B, 3, H, W] raw 0..1 (reference feeds ToTensor output directly).

    Returns (rel_depth [B, H, W], hooks dict with the 6 tapped activations).
    """
    vcfg = cfg.vit
    b, _, h, w = x.shape
    assert h % cfg.patch_size == 0 and w % cfg.patch_size == 0, (h, w)
    gh, gw = h // cfg.patch_size, w // cfg.patch_size

    vp = params["vit"]
    tok = vit_lib._patchify(x, cfg.patch_size) @ vp["patch_embed"]["w"] + vp["patch_embed"]["b"]
    cls = jnp.broadcast_to(vp["cls_token"].astype(tok.dtype), (b, 1, tok.shape[-1]))
    tok = jnp.concatenate([cls, tok], axis=1)
    tok = tok + _resize_pos_embed(vp["pos_embed"], gh, gw).astype(tok.dtype)

    impl = vit_lib.resolve_attn_impl(attn_impl, need_attn=False, precision=None) \
        if attn_impl == "auto" else attn_impl
    n_tok = tok.shape[1]
    n_valid = None
    if impl in ("flash", "fused") and n_tok % 128:
        # pad the token axis ONCE for the whole stack (same trick as
        # vit_apply): the Pallas kernels mask padded keys to weight exactly
        # 0 via n_valid, every other op is per-token, and taps are sliced
        # back — without this the 1 + gh*gw token count fails the fused
        # kernel's lane gate and every block re-pads inside flash
        n_valid = n_tok
        tok = jnp.pad(tok, ((0, 0), (0, (-n_tok) % 128), (0, 0)))
    taps = []
    for i, blk in enumerate(vp["blocks"]):
        tok, _, _ = vit_lib._block(blk, tok, vcfg, impl, n_valid)
        if i in cfg.hooks:
            # hub hooks fire on raw block outputs (no norm)
            taps.append(tok[:, :n_tok])

    rel_depth, hooks = dpt_forward(params["dpt"], taps, (gh, gw), cfg.dpt)
    return rel_depth, hooks


def midas_dpt_from_torch(state_dict: dict) -> dict:
    """torch.hub DPT_Large state dict -> param pytree.

    Layout: ``pretrained.model.*`` (timm ViT-L/16 — same key schema as DINO,
    so the DINO converter applies) + ``pretrained.act_postprocess{1..4}`` +
    ``scratch.*`` (the DPT decoder, same schema as ZoeDepth's MiDaS core).
    """
    from depthg_tpu.models.zoedepth.convert import dpt_params_from_torch
    from depthg_tpu.utils.ckpt import vit_params_from_torch

    sd = state_dict.get("model", state_dict)
    sd = {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}
    vit_sd = {k[len("pretrained.model."):]: v for k, v in sd.items()
              if k.startswith("pretrained.model.")}
    dpt_sd = {k: v for k, v in sd.items()
              if ".scratch." in k or "scratch." in k or "act_postprocess" in k}
    return {"vit": vit_params_from_torch(vit_sd),
            "dpt": dpt_params_from_torch(dpt_sd)}


def load_midas_dpt(path: str):
    """Load a DPT_Large .pt; config derived from the checkpoint shapes."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    params = midas_dpt_from_torch(blob)
    depth = len(params["vit"]["blocks"])
    d = params["vit"]["patch_embed"]["w"].shape[1]
    ps = int(round((params["vit"]["patch_embed"]["w"].shape[0] // 3) ** 0.5))
    n_pos = params["vit"]["pos_embed"].shape[1] - 1
    cfg = MidasDPTConfig(
        patch_size=ps, embed_dim=d, depth=depth,
        num_heads={768: 12, 1024: 16}.get(d, d // 64),
        hooks=(depth // 4 - 1, depth // 2 - 1, 3 * depth // 4 - 1, depth - 1),
        img_size=int(round(n_pos ** 0.5)) * ps,
        features=params["dpt"]["rn"][0]["w"].shape[0],
        reassemble_channels=tuple(r["project"]["w"].shape[0]
                                  for r in params["dpt"]["reassemble"]),
    )
    return params, cfg
