"""scripts/generate_depth.py bucketed-batch driver: batching, tail padding,
per-image normalization, and the MiDaS inversion quirk, with a stub model
(reference generate_depth.py:163 runs batch-1; BEiT-L is too heavy for the
CPU suite, so the jitted stub stands in for ``infer``)."""

import importlib.util
import os
import sys

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    (root / "val").mkdir()
    rng = np.random.default_rng(0)
    # 5 images of one size (bucket A) + 2 of another (bucket B) => with
    # batch_size=4, bucket A flushes once full (4) + tail (1), B tail (2)
    sizes = [(96, 64)] * 5 + [(64, 96)] * 2
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(root / "val" / f"im{i}.jpg")
    return root


def test_bucketed_batching_writes_all_images(image_dir, tmp_path, capsys):
    gd = _load_script("generate_depth")
    args = gd.get_args_parser().parse_args([
        "--data_dir", str(image_dir), "--output_dir", str(tmp_path / "out"),
        "--batch_size", "4", "--save_features",
    ])
    os.makedirs(args.output_dir, exist_ok=True)

    batch_shapes = []

    @jax.jit
    def infer(p, x):
        # depth = channel mean (depends on content so padding rows differ),
        # feats = 2x2-pooled mean
        d = x.mean(axis=1, keepdims=True)
        f = d[:, :, ::2, ::2]
        return d.astype(jnp.float32), f.astype(jnp.float32)

    real_infer = infer

    def spy(p, x):
        batch_shapes.append(tuple(x.shape))
        return real_infer(p, x)

    gd.run_pipeline(args, spy, params={})

    out = tmp_path / "out" / "val"
    pngs = sorted(out.glob("*_zoedepth.png"))
    assert len(pngs) == 7
    # every dispatch is exactly batch_size deep (tails zero-padded). The
    # stub runs under run_pipeline's data-parallel shard_map on the
    # 8-virtual-device conftest mesh (4 devices for batch 4), so it records
    # PER-DEVICE shapes once per trace — one per size bucket, each exactly
    # batch_size/mesh deep.
    assert sorted(batch_shapes) == [(1, 3, 64, 96), (1, 3, 96, 64)]
    # per-image min-max normalization: each PNG spans ~the full u8 range
    for p in pngs:
        a = np.asarray(Image.open(p))
        assert a.min() == 0 and a.max() == 255
    feats = sorted(out.glob("*_feats.npy"))
    assert len(feats) == 7 and np.load(feats[0]).ndim == 3


def test_midas_inversion(image_dir, tmp_path):
    gd = _load_script("generate_depth")
    out_zoe, out_midas = tmp_path / "zoe", tmp_path / "midas"

    def infer(p, x):
        d = x.mean(axis=1, keepdims=True)
        return d.astype(jnp.float32), d.astype(jnp.float32)

    for model, out in (("zoedepth", out_zoe), ("midas", out_midas)):
        args = gd.get_args_parser().parse_args([
            "--data_dir", str(image_dir), "--output_dir", str(out),
            "--batch_size", "2", "--model", model,
        ])
        os.makedirs(args.output_dir, exist_ok=True)
        gd.run_pipeline(args, infer, params={})

    a = np.asarray(Image.open(next((out_zoe / "val").glob("im0_*.png"))),
                   np.int32)
    b = np.asarray(Image.open(next((out_midas / "val").glob("im0_*.png"))),
                   np.int32)
    # same stub depth, midas output inverted (reference generate_depth.py:192-197)
    assert np.abs((255 - a) - b).max() <= 1


@pytest.mark.slow
def test_sharded_fused_zoe_through_pipeline(image_dir, tmp_path, monkeypatch):
    """A real (tiny) ZoeDepth with fused whole-KV attention through the
    data-parallel shard_map path: Pallas-in-shard_map is the supported
    multi-device pattern (plain sharded-jit would all-gather around the
    opaque kernel). Interpret mode on the virtual CPU mesh."""
    import dataclasses

    import depthg_tpu.ops.attention as attn
    from depthg_tpu.models.zoedepth import (ZoeConfig, zoedepth_forward,
                                            zoedepth_init)
    from depthg_tpu.models.zoedepth.beit import BEiTConfig
    from depthg_tpu.models.zoedepth.dpt import DPTConfig

    for name in ("whole_kv_mha_qkv", "whole_kv_mha"):
        orig = getattr(attn, name)
        monkeypatch.setattr(
            attn, name,
            lambda *a, _o=orig, **k: _o(*a, **{**k, "interpret": True}))

    cfg = ZoeConfig(
        n_bins=4, bin_embedding_dim=8, n_attractors=(2, 2, 1, 1),
        img_size=(64, 96),
        beit=BEiTConfig(embed_dim=64, depth=4, num_heads=4,
                        pretrain_window=4, hooks=(0, 1, 2, 3),
                        attn_impl="fused"),
        dpt=DPTConfig(embed_dim=64, features=16,
                      reassemble_channels=(8, 16, 32, 32)))
    params = zoedepth_init(jax.random.PRNGKey(0), cfg)

    @jax.jit
    def infer(p, x):
        out = zoedepth_forward(p, x, cfg)
        return out["metric_depth"], out["feats"]

    gd = _load_script("generate_depth")
    args = gd.get_args_parser().parse_args([
        "--data_dir", str(image_dir), "--output_dir", str(tmp_path / "out"),
        "--batch_size", "4",
    ])
    os.makedirs(args.output_dir, exist_ok=True)
    gd.run_pipeline(args, infer, params)
    pngs = sorted((tmp_path / "out" / "val").glob("*_zoedepth.png"))
    assert len(pngs) == 7
    for p in pngs:
        a = np.asarray(Image.open(p))
        assert a.min() == 0 and a.max() == 255
