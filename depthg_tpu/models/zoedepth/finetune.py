"""ZoeDepth fine-tuning surface: depth losses + a jitted AdamW train step.

Reference behavior being reproduced (NOT its torch structure):

* ``SILogLoss`` — ``src/zoedepth/trainers/loss.py:42-96``: bilinear
  align_corners=True interpolation of the prediction to the target
  resolution, masked log-residuals over the WHOLE batch jointly,
  ``10 * sqrt(var(g) + beta * mean(g)^2)`` with torch's unbiased variance.
* ``GradL1Loss`` — ``loss.py:99-137``: squared gradient magnitude and
  ``atan`` gradient angle at pixel (i, j) from forward diffs, mask eroded so
  every diff is between two valid pixels, L1 on both terms.
* ``compute_scale_and_shift`` / ``ScaleAndShiftInvariantLoss`` —
  ``loss.py:258-305``: per-image closed-form least-squares (s, t) over the
  valid mask, L1 on the scaled prediction.
* The fine-tune optimizer step — ``base_trainer.py:94-117`` (AdamW with
  per-group LRs from ``get_lr_params``, ``zoedepth_v1.py:204-236``: encoder
  / relative-position tables / MiDaS scratch / new heads) +
  ``base_trainer.py:113-117`` (OneCycleLR, cosine) + ``zoedepth_trainer.py:
  48-104`` (w_si * SILog + w_grad * GradL1, grad clipping).

TPU-first re-design: the losses are pure functions over ``(pred, target,
mask)`` using mask-weighted moments instead of boolean indexing (XLA needs
static shapes — ``g[mask]`` would force a host round-trip per batch), and
the entire optimizer step (forward, losses, global-norm clip, four-group
AdamW with per-group one-cycle schedules) is ONE jitted program via
``optax.multi_transform``, so a fine-tune step costs a single dispatch.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax

from depthg_tpu.models.zoedepth.model import ZoeConfig, zoedepth_forward
from depthg_tpu.ops.resize import resize_bilinear

_LOG_ALPHA = 1e-7  # loss.py:70 — log(x + alpha) guard


def _prep(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    """Common preamble: [B,1,H,W] everywhere, prediction upsampled to the
    target resolution (bilinear align_corners=True, loss.py:53-55)."""
    if target.ndim == 3:
        target = target[:, None]
    if mask.ndim == 3:
        mask = mask[:, None]
    if pred.ndim == 3:
        pred = pred[:, None]
    if pred.shape[-2:] != target.shape[-2:]:
        pred = resize_bilinear(pred, target.shape[-2:], align_corners=True)
    return pred, target, mask.astype(bool)


def silog_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
               beta: float = 0.15, return_interpolated: bool = False):
    """Scale-invariant log loss (loss.py:42-96). ``pred``/``target`` are
    positive depths; ``mask`` selects valid ground truth. Statistics run over
    all valid pixels of the batch jointly, like torch's ``g[mask]``."""
    pred, target, mask = _prep(pred, target, mask)
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    # safe-where: masked-out pixels may hold zero/negative sentinels whose
    # log would poison gradients through the 0 * nan trap
    p = jnp.where(mask, pred, 1.0)
    t = jnp.where(mask, target, 1.0)
    g = jnp.log(p + _LOG_ALPHA) - jnp.log(t + _LOG_ALPHA)
    mean = jnp.sum(g * w) / n
    # torch.var(flat_masked) is unbiased: divisor n - 1
    var = jnp.sum((g - mean) ** 2 * w) / jnp.maximum(n - 1.0, 1.0)
    loss = 10.0 * jnp.sqrt(var + beta * mean * mean)
    return (loss, pred) if return_interpolated else loss


def _image_grads(x: jnp.ndarray, safe: jnp.ndarray | None = None):
    """(squared magnitude, atan angle) of forward diffs (loss.py:99-106).
    ``safe``: eroded validity mask — where False, diffs are replaced by 1
    before the atan so masked pixels cannot emit nan gradients."""
    dx = x[..., 1:, 1:] - x[..., 1:, :-1]
    dy = x[..., 1:, 1:] - x[..., :-1, 1:]
    if safe is not None:
        dx = jnp.where(safe, dx, 1.0)
        dy = jnp.where(safe, dy, 1.0)
    mag = dx * dx + dy * dy
    angle = jnp.arctan(dy / (dx + 1e-10))
    return mag, angle


def grad_l1_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray):
    """Gradient-matching L1 loss (loss.py:112-137): L1 between the squared
    gradient magnitudes plus L1 between the gradient angles, over the mask
    eroded so both pixels of every diff are valid (grad_mask, loss.py:109)."""
    pred, target, mask = _prep(pred, target, mask)
    mg = mask[..., 1:, 1:] & mask[..., 1:, :-1] & mask[..., :-1, 1:]
    w = mg.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    pm, pa = _image_grads(pred, mg)
    tm, ta = _image_grads(target, mg)
    return (jnp.sum(jnp.abs(pm - tm) * w) / n
            + jnp.sum(jnp.abs(pa - ta) * w) / n)


def compute_scale_and_shift(pred: jnp.ndarray, target: jnp.ndarray,
                            mask: jnp.ndarray):
    """Per-image least-squares (scale, shift) aligning pred to target over
    the mask (loss.py:258-279). Inputs [B, H, W]; returns two [B] vectors,
    zero where the 2x2 normal system is singular."""
    w = mask.astype(jnp.float32)
    a00 = jnp.sum(w * pred * pred, axis=(1, 2))
    a01 = jnp.sum(w * pred, axis=(1, 2))
    a11 = jnp.sum(w, axis=(1, 2))
    b0 = jnp.sum(w * pred * target, axis=(1, 2))
    b1 = jnp.sum(w * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    valid = det > 0
    safe_det = jnp.where(valid, det, 1.0)
    s = jnp.where(valid, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    t = jnp.where(valid, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return s, t


def scale_shift_invariant_loss(pred: jnp.ndarray, target: jnp.ndarray,
                               mask: jnp.ndarray):
    """SSILoss (loss.py:281-305): masked L1 after per-image scale/shift
    alignment. Accepts [B,H,W] or [B,1,H,W] (squeezed like the reference)."""
    pred, target, mask = _prep(pred, target, mask)
    pred, target, mask = pred[:, 0], target[:, 0], mask[:, 0]
    s, t = compute_scale_and_shift(pred, target, mask)
    scaled = s[:, None, None] * pred + t[:, None, None]
    w = mask.astype(jnp.float32)
    return jnp.sum(jnp.abs(scaled - target) * w) / jnp.maximum(w.sum(), 1.0)


# ---------------------------------------------------------------------------
# fine-tune step
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FinetuneConfig:
    """config_zoedepth.json "train" block defaults + COMMON_TRAINING_CONFIG
    (reference utils/config.py:242 clip_grad)."""
    lr: float = 0.000161
    wd: float = 0.01
    w_si: float = 1.0
    w_grad: float = 0.0
    beta: float = 0.15
    clip_grad: float = 0.1
    total_steps: int = 1000  # epochs * steps_per_epoch, for the schedule
    # OneCycleLR sched_kwargs (cosine anneal, the torch default)
    pct_start: float = 0.7
    div_factor: float = 1.0
    final_div_factor: float = 10000.0
    # get_lr_params factors (zoedepth_v1.py:204-226)
    encoder_lr_factor: float = 10.0
    pos_enc_lr_factor: float = 10.0
    midas_lr_factor: float = 1.0
    same_lr: bool = False


def lr_group_labels(params: dict) -> dict:
    """Pytree of LR-group names mirroring ``get_lr_params``: the BEiT encoder
    (sans relative-position tables), the rel-pos tables, the MiDaS scratch
    (DPT decoder), and everything else (the new ZoeDepth heads) at base LR."""
    def label(path, _leaf):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top == "beit":
            inner = "".join(str(getattr(p, "key", "")) for p in path[1:])
            return "pos_enc" if "rel_pos_table" in inner else "encoder"
        if top == "dpt":
            return "midas"
        return "head"
    return jax.tree_util.tree_map_with_path(label, params)


def make_finetune_optimizer(params: dict, ftcfg: FinetuneConfig):
    """Global-norm clip -> four-group AdamW, each group on its own cosine
    one-cycle schedule peaking at ``lr / group_factor`` — the reference's
    OneCycleLR applies the cycle per param group (base_trainer.py:113-117)."""
    factors = {"encoder": ftcfg.encoder_lr_factor,
               "pos_enc": ftcfg.pos_enc_lr_factor,
               "midas": ftcfg.midas_lr_factor,
               "head": 1.0}
    if ftcfg.same_lr:
        factors = {k: 1.0 for k in factors}

    def group_opt(factor):
        sched = optax.cosine_onecycle_schedule(
            transition_steps=max(int(ftcfg.total_steps), 1),
            peak_value=ftcfg.lr / factor,
            pct_start=ftcfg.pct_start,
            div_factor=ftcfg.div_factor,
            final_div_factor=ftcfg.final_div_factor)
        return optax.adamw(sched, weight_decay=ftcfg.wd)

    tx = optax.multi_transform({k: group_opt(v) for k, v in factors.items()},
                               lr_group_labels(params))
    if ftcfg.clip_grad > 0:
        tx = optax.chain(optax.clip_by_global_norm(ftcfg.clip_grad), tx)
    return tx


def finetune_loss(params: dict, batch: dict, zcfg: ZoeConfig,
                  ftcfg: FinetuneConfig):
    """w_si * SILog (+ w_grad * GradL1 on the interpolated prediction) —
    zoedepth_trainer.py:66-77."""
    out = zoedepth_forward(params, batch["image"], zcfg)
    pred = out["metric_depth"]
    l_si, pred_i = silog_loss(pred, batch["depth"], batch["mask"],
                              beta=ftcfg.beta, return_interpolated=True)
    loss = ftcfg.w_si * l_si
    logs = {"loss/silog": l_si}
    if ftcfg.w_grad > 0:
        l_grad = grad_l1_loss(pred_i, batch["depth"], batch["mask"])
        loss = loss + ftcfg.w_grad * l_grad
        logs["loss/grad_l1"] = l_grad
    logs["loss/total"] = loss
    return loss, logs


def make_finetune_step(zcfg: ZoeConfig, ftcfg: FinetuneConfig):
    """Returns (init_fn, step_fn): ``opt_state = init_fn(params)``;
    ``params, opt_state, logs = step_fn(params, opt_state, batch)`` — one
    jitted program per step. ``batch``: image [B,3,H,W] (already MiDaS-
    normalized), depth [B,1,Ht,Wt] metric, mask [B,1,Ht,Wt] validity."""
    tx = None

    def init_fn(params):
        nonlocal tx
        tx = make_finetune_optimizer(params, ftcfg)
        return tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, batch):
        (_, logs), grads = jax.value_and_grad(finetune_loss, has_aux=True)(
            params, batch, zcfg, ftcfg)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    return init_fn, step_fn
