"""ZoeDepth fine-tune surface: loss parity vs a torch transcription of the
reference (``src/zoedepth/trainers/loss.py``) + a 5-step fine-tune smoke on
synthetic depth data (VERDICT r3 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from depthg_tpu.models.zoedepth.beit import BEiTConfig
from depthg_tpu.models.zoedepth.dpt import DPTConfig
from depthg_tpu.models.zoedepth.finetune import (
    FinetuneConfig, compute_scale_and_shift, grad_l1_loss, lr_group_labels,
    make_finetune_step, scale_shift_invariant_loss, silog_loss)
from depthg_tpu.models.zoedepth.model import ZoeConfig, zoedepth_init

torch = pytest.importorskip("torch")


def _rand_depth_batch(b=2, h=24, w=32, hole_frac=0.3, seed=0):
    rng = np.random.default_rng(seed)
    pred = rng.uniform(0.1, 9.0, (b, 1, h, w)).astype(np.float32)
    target = rng.uniform(0.1, 9.0, (b, 1, h, w)).astype(np.float32)
    mask = rng.random((b, 1, h, w)) > hole_frac
    # invalid pixels carry a zero sentinel like real sparse depth maps
    target = np.where(mask, target, 0.0).astype(np.float32)
    return pred, target, mask


def _torch_silog(pred, target, mask, beta=0.15):
    """Transcription of SILogLoss.forward (loss.py:50-96), same-res path."""
    inp = torch.tensor(pred)[torch.tensor(mask)]
    tgt = torch.tensor(target)[torch.tensor(mask)]
    g = torch.log(inp + 1e-7) - torch.log(tgt + 1e-7)
    dg = torch.var(g) + beta * torch.pow(torch.mean(g), 2)
    return float(10 * torch.sqrt(dg))


def _torch_grad_l1(pred, target, mask):
    """Transcription of GradL1Loss.forward + grad/grad_mask (loss.py:99-137)."""
    p, t, m = torch.tensor(pred), torch.tensor(target), torch.tensor(mask)

    def grad(x):
        dx = x[..., 1:, 1:] - x[..., 1:, :-1]
        dy = x[..., 1:, 1:] - x[..., :-1, 1:]
        return dx ** 2 + dy ** 2, torch.atan(dy / (dx + 1e-10))

    mg = m[..., 1:, 1:] & m[..., 1:, :-1] & m[..., :-1, 1:]
    gp, gt = grad(p), grad(t)
    return float(torch.nn.functional.l1_loss(gp[0][mg], gt[0][mg])
                 + torch.nn.functional.l1_loss(gp[1][mg], gt[1][mg]))


def _torch_ssi(pred, target, mask):
    """Transcription of compute_scale_and_shift + SSILoss (loss.py:258-305)."""
    p = torch.tensor(pred).squeeze(1)
    t = torch.tensor(target).squeeze(1)
    m = torch.tensor(mask).squeeze(1).float()
    a00 = torch.sum(m * p * p, (1, 2))
    a01 = torch.sum(m * p, (1, 2))
    a11 = torch.sum(m, (1, 2))
    b0 = torch.sum(m * p * t, (1, 2))
    b1 = torch.sum(m * t, (1, 2))
    det = a00 * a11 - a01 * a01
    x0 = (a11 * b0 - a01 * b1) / det
    x1 = (-a01 * b0 + a00 * b1) / det
    scaled = x0.view(-1, 1, 1) * p + x1.view(-1, 1, 1)
    return float(torch.nn.functional.l1_loss(scaled[m.bool()], t[m.bool()]))


def test_silog_matches_torch():
    pred, target, mask = _rand_depth_batch()
    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(target),
                            jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _torch_silog(pred, target, mask),
                               rtol=1e-5)


def test_silog_full_mask_and_interpolation():
    # full mask + low-res prediction: exercises the align_corners=True resize
    rng = np.random.default_rng(1)
    pred = rng.uniform(0.5, 5.0, (2, 1, 12, 16)).astype(np.float32)
    target = rng.uniform(0.5, 5.0, (2, 1, 24, 32)).astype(np.float32)
    mask = np.ones_like(target, bool)
    up = torch.nn.functional.interpolate(
        torch.tensor(pred), (24, 32), mode="bilinear", align_corners=True).numpy()
    ours = float(silog_loss(jnp.asarray(pred), jnp.asarray(target),
                            jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _torch_silog(up, target, mask), rtol=1e-5)


def test_grad_l1_matches_torch():
    pred, target, mask = _rand_depth_batch(seed=2)
    ours = float(grad_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                              jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _torch_grad_l1(pred, target, mask),
                               rtol=2e-4)


def test_ssi_matches_torch():
    pred, target, mask = _rand_depth_batch(seed=3)
    ours = float(scale_shift_invariant_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _torch_ssi(pred, target, mask), rtol=1e-4)


def test_scale_shift_singular_batch_is_zero():
    # an all-masked image has det == 0 -> (s, t) = (0, 0), no nan (loss.py:273)
    pred = jnp.ones((1, 8, 8))
    target = jnp.ones((1, 8, 8))
    mask = jnp.zeros((1, 8, 8), bool)
    s, t = compute_scale_and_shift(pred, target, mask)
    assert float(s[0]) == 0.0 and float(t[0]) == 0.0


def test_losses_have_finite_grads_with_holes():
    pred, target, mask = _rand_depth_batch(hole_frac=0.5, seed=4)

    def total(p):
        return (silog_loss(p, jnp.asarray(target), jnp.asarray(mask))
                + grad_l1_loss(p, jnp.asarray(target), jnp.asarray(mask)))

    g = jax.grad(total)(jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()


TINY = ZoeConfig(
    n_bins=4, bin_embedding_dim=8, n_attractors=(2, 2, 1, 1),
    img_size=(64, 96),
    beit=BEiTConfig(embed_dim=64, depth=4, num_heads=4, pretrain_window=4,
                    hooks=(0, 1, 2, 3)),
    dpt=DPTConfig(embed_dim=64, features=16,
                  reassemble_channels=(8, 16, 32, 32)))


def test_lr_group_labels_cover_reference_groups():
    params = zoedepth_init(jax.random.PRNGKey(0), TINY)
    labels = lr_group_labels(params)
    flat = set(jax.tree_util.tree_leaves(labels))
    assert flat == {"encoder", "pos_enc", "midas", "head"}
    # every rel-pos table is its own group (pos_enc_lr_factor)
    for blk_p, blk_l in zip(params["beit"]["blocks"],
                            labels["beit"]["blocks"]):
        assert blk_l["rel_pos_table"] == "pos_enc"
        assert blk_l["qkv_w"] == "encoder"
    assert set(jax.tree_util.tree_leaves(labels["dpt"])) == {"midas"}
    assert labels["conv2"]["w"] == "head"


@pytest.mark.slow
def test_finetune_smoke_loss_decreases():
    rng = np.random.default_rng(0)
    params = zoedepth_init(jax.random.PRNGKey(1), TINY)
    b, h, w = 2, 64, 64
    img = rng.standard_normal((b, 3, h, w)).astype(np.float32) * 0.5
    depth = rng.uniform(0.5, 8.0, (b, 1, h, w)).astype(np.float32)
    mask = np.ones((b, 1, h, w), bool)
    batch = {"image": jnp.asarray(img), "depth": jnp.asarray(depth),
             "mask": jnp.asarray(mask)}

    ftcfg = FinetuneConfig(lr=3e-4, w_grad=0.1, total_steps=5)
    init_fn, step_fn = make_finetune_step(TINY, ftcfg)
    opt_state = init_fn(params)

    losses = []
    for _ in range(5):
        params, opt_state, logs = step_fn(params, opt_state, batch)
        losses.append(float(logs["loss/total"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_datasets_config_table():
    from depthg_tpu.models.zoedepth.config import (
        ALL_EVAL_DATASETS, DEPTH_DATASETS, datasets_config)

    assert len(DEPTH_DATASETS) == 13  # 12 datasets + kitti_test alias
    assert set(ALL_EVAL_DATASETS) <= set(DEPTH_DATASETS)
    k = datasets_config("kitti")
    assert k["garg_crop"] and k["do_kb_crop"] and not k["eigen_crop"]
    assert (k["min_depth"], k["max_depth"]) == (0.001, 80)
    assert (k["input_height"], k["input_width"]) == (352, 1216)
    n = datasets_config("nyu", data_root="/data")
    assert n["eigen_crop"] and not n["do_kb_crop"]
    assert n["root"].startswith("/data")
    assert datasets_config("sunrgbd")["max_depth_eval"] == 8
    assert datasets_config("diml_outdoor")["min_depth_eval"] == 2
    # hypersim quirk: indoor ranges for train, 80 m eval ceiling
    hs = datasets_config("hypersim_test")
    assert hs["max_depth"] == 10 and hs["max_depth_eval"] == 80
