"""Generate per-image depth PNGs for a dataset with the ZoeDepth port.

Mirrors reference ``generate_depth.py``: iterate a dataset (imagefolder /
cocostuff / cityscapes / potsdam / nyuv2 / pascalvoc split), run ZoeDepth
inference (pad + flip TTA), min-max normalize to 8-bit and save
``{output_dir}/{parent_folder}/{stem}_{model}.png`` — the filename scheme the
data layer consumes (``depth/{split}/{id}_zoedepth.png`` etc.).

``--model midas`` runs the real MiDaS DPT_Large (ViT-L/16,
``models/midas_dpt.py`` — the model the reference pulls from torch.hub at
``generate_depth.py:97-113``) on RAW un-normalized images, exactly as the
reference calls ``midas(images)`` (``generate_depth.py:166``); its output is
min-max normalized and INVERTED (``generate_depth.py:190-197``).

Differences by design:
* the reference's output path handling is buggy when ``--save_features`` is
  off (it writes next to the source image); here outputs always land under
  ``--output_dir`` with the ``_{model}`` suffix;
* weights: pass ``--weights /path/to/ZoeD_M12_N.pt`` (zoedepth) or
  ``/path/to/dpt_large-midas-2f21e586.pt`` (midas); zero-egress: no
  download. Without weights the script refuses unless ``--allow_random``.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from depthg_tpu.data.transforms import image_to_array as _image_to_array


def get_args_parser():
    p = argparse.ArgumentParser("Depth", add_help=False)
    p.add_argument("--model", default="zoedepth", choices=["zoedepth", "midas"])
    p.add_argument("--data_dir", default="")
    p.add_argument("--dataset", default="imagefolder",
                   choices=["cocostuff", "potsdam", "cityscapes", "imagefolder",
                            "nyuv2", "pascalvoc"])
    p.add_argument("--split", default="val")
    p.add_argument("--output_dir", default="")
    p.add_argument("--save_features", action="store_true")
    p.add_argument("--weights", default=None, help="path to ZoeD_M12_N.pt")
    p.add_argument("--allow_random", action="store_true",
                   help="run with random weights (smoke testing only)")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32", "int8"],
                   help="int8 = w8a8 block linears in the backbone (2x MXU "
                        "peak), bf16 everywhere else")
    p.add_argument("--batch_size", type=int, default=8,
                   help="images per device dispatch (same-size buckets are "
                        "batched; tails are zero-padded so each bucket "
                        "compiles once)")
    p.add_argument("--attn_impl", default="auto",
                   choices=["auto", "xla", "flash", "fused"],
                   help="backbone attention path (auto = fused/flash on TPU); "
                        "zoedepth supports auto|xla|fused")
    return p


def iter_images(args):
    """Yield (pil_image, naming_path) pairs for the chosen dataset.

    Non-imagefolder datasets are read through their own ``__getitem__`` (the
    reference wraps them in a DataLoader too) — Potsdam images live in .mat
    files and NYUv2 filepaths are bare names, so opening ``filepaths``
    directly would yield nothing; ``filepaths`` is used only for naming.
    """
    from depthg_tpu.data import datasets as D
    from depthg_tpu.data.transforms import RawTransform

    raw = RawTransform(is_label=False)
    rawl = RawTransform(is_label=True)
    if args.dataset == "imagefolder":
        root = args.data_dir
        for sub in sorted(os.listdir(root)):
            subp = os.path.join(root, sub)
            if not os.path.isdir(subp):
                continue
            for fn in sorted(os.listdir(subp)):
                yield Image.open(os.path.join(subp, fn)).convert("RGB"), os.path.join(subp, fn)
        return
    if args.dataset == "potsdam":
        ds = D.Potsdam(args.data_dir, args.split, raw, rawl, coarse_labels=False)
    elif args.dataset == "cityscapes":
        ds = D.CityscapesSeg(args.data_dir, args.split, raw, rawl)
    elif args.dataset == "cocostuff":
        ds = D.Coco(args.data_dir, args.split, raw, rawl,
                    coarse_labels=False, exclude_things=False)
    elif args.dataset == "nyuv2":
        ds = D.NYUv2(args.data_dir, args.split, raw, rawl)
    elif args.dataset == "pascalvoc":
        ds = D.PascalVOC(args.data_dir, args.split, raw, rawl)
    else:
        raise NotImplementedError(args.dataset)
    rng = np.random.default_rng(0)
    for i in range(len(ds)):
        item = ds.__getitem__(i, rng)
        arr = item["img"]  # [3, H, W] float in [0, 1] (RawTransform: no normalize)
        pil = Image.fromarray(
            np.clip(arr.transpose(1, 2, 0) * 255, 0, 255).astype(np.uint8))
        yield pil, str(ds.filepaths[i])


def main(args):
    import jax
    import jax.numpy as jnp

    from depthg_tpu.utils.ckpt import to_jax
    from depthg_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16

    if args.model == "midas":
        from depthg_tpu.models.midas_dpt import (
            MidasDPTConfig,
            load_midas_dpt,
            midas_dpt_forward,
            midas_dpt_init,
        )

        load_dtype = jnp.float32 if args.dtype == "int8" else dtype
        if args.weights and os.path.exists(args.weights):
            params, mcfg = load_midas_dpt(args.weights)
            params = to_jax(params, dtype=load_dtype)
        elif args.allow_random:
            print("WARNING: running with RANDOM DPT_Large weights (smoke test only).")
            mcfg = MidasDPTConfig()
            params = midas_dpt_init(jax.random.PRNGKey(0), mcfg, load_dtype)
        else:
            raise SystemExit("No --weights given (this environment cannot download "
                             "dpt_large-midas-2f21e586.pt). Pass --weights or "
                             "--allow_random.")
        if args.dtype == "int8":  # quantize from f32, bf16 for the decoder
            from depthg_tpu.models.layers import cast_tree_bf16
            from depthg_tpu.models.vit import quantize_vit_params
            params = {"vit": quantize_vit_params(params["vit"]),
                      "dpt": cast_tree_bf16(params["dpt"])}

        @jax.jit
        def infer(p, x):
            # raw 0..1 input, single forward — reference generate_depth.py:166
            depth, hooks = midas_dpt_forward(p, x.astype(dtype), mcfg,
                                             attn_impl=args.attn_impl)
            return depth[:, None].astype(jnp.float32), hooks["out_conv"].astype(jnp.float32)
    else:
        from depthg_tpu.models.zoedepth import ZoeConfig, zoedepth_infer, zoedepth_init
        from depthg_tpu.models.zoedepth.convert import load_zoedepth_pt

        cfg = ZoeConfig()
        load_dtype = jnp.float32 if args.dtype == "int8" else dtype
        if args.weights and os.path.exists(args.weights):
            params, cfg = load_zoedepth_pt(args.weights, with_config=True)
            params = to_jax(params, dtype=load_dtype)
        elif args.allow_random:
            print("WARNING: running with RANDOM ZoeDepth weights (smoke test only).")
            params = zoedepth_init(jax.random.PRNGKey(0), cfg, load_dtype)
        else:
            raise SystemExit("No --weights given (this environment cannot download "
                             "ZoeD_M12_N.pt). Pass --weights or --allow_random.")
        impl = args.attn_impl
        if impl == "flash":  # BEiT has no flash path (the rel-pos bias must
            # be added inside the kernel) — honor the intent (a fused
            # kernel), not the letter
            print("zoedepth has no 'flash' attention; using 'auto' "
                  "(fused on TPU)", flush=True)
            impl = "auto"
        import dataclasses
        cfg = dataclasses.replace(
            cfg, beit=dataclasses.replace(cfg.beit, attn_impl=impl))
        if args.dtype == "int8":  # quantize from f32, bf16 for the rest
            from depthg_tpu.models.layers import cast_tree_bf16
            from depthg_tpu.models.zoedepth.beit import quantize_beit_params
            params = {k: (quantize_beit_params(v) if k == "beit"
                          else cast_tree_bf16(v)) for k, v in params.items()}

        @jax.jit
        def infer(p, x):
            depth, feats = zoedepth_infer(p, x.astype(dtype), cfg, return_feats=True)
            return depth.astype(jnp.float32), feats.astype(jnp.float32)

    run_pipeline(args, infer, params)


def run_pipeline(args, infer, params):
    """Drive ``infer(params, x[B,3,H,W]) -> (depth[B,1,h,w], feats)`` over
    the input images with size-bucketed batching. Split from ``main`` so the
    batching/normalization logic is testable with a stub model."""
    import jax
    import jax.numpy as jnp

    out_root = Path(args.output_dir)
    n = 0
    bs = max(1, args.batch_size)
    buckets = {}  # (bh, bw) -> list of (x [1,3,bh,bw], (ow, oh, src))
    shard_n = 1  # dispatch batches must stay divisible by the mesh

    if len(jax.devices()) > 1:
        # data-parallel depth generation: batch-shard each bucket dispatch
        # over the ICI mesh, params replicated (the reference's nearest
        # analogue is torch DataParallel on the KNN/eval models only —
        # SURVEY §2.7; its depth generation is strictly single-device).
        # shard_map rather than sharded-jit: the forward is embarrassingly
        # batch-parallel (per-image reductions only), and the SPMD
        # partitioner treats the Pallas attention kernels as opaque calls
        # it would otherwise replicate behind an all-gather.
        from jax.sharding import PartitionSpec as P

        from depthg_tpu.parallel.mesh import make_mesh_for_batch, replicate
        mesh = make_mesh_for_batch(bs)
        if mesh.size > 1:
            params = replicate(params, mesh)
            # check_vma=False: the per-shard body is closed (no collectives),
            # and Pallas out_shapes don't declare varying mesh axes
            infer = jax.jit(jax.shard_map(
                infer, mesh=mesh, in_specs=(P(), P("data")),
                out_specs=(P("data"), P("data")), check_vma=False))
            shard_n = mesh.size
            print(f"data-parallel over {mesh.size} devices", flush=True)

    def write_one(depth, ow, oh, src, feats=None):
        nonlocal n
        if depth.shape != (oh, ow):
            depth = np.asarray(Image.fromarray(depth, mode="F")
                               .resize((ow, oh), Image.BILINEAR))
        # per-image min-max normalization (batching does not change it);
        # MiDaS relative depth is inverted — reference generate_depth.py:192-197
        depth = (depth - depth.min()) / max(depth.max() - depth.min(), 1e-12)
        if args.model == "midas":
            depth = 1.0 - depth
        src_path = Path(src)
        folder = out_root / src_path.parent.name
        folder.mkdir(parents=True, exist_ok=True)
        out_png = folder / f"{src_path.stem}_{args.model}.png"
        Image.fromarray((depth * 255).astype(np.uint8)).save(out_png)
        if feats is not None:
            np.save(folder / f"{src_path.stem}_feats.npy", feats)
        n += 1
        if n % 50 == 0:
            print(f"{n} depth maps written", flush=True)

    def flush(items):
        k = len(items)
        xs = np.concatenate([it[0] for it in items], axis=0)
        # pad tails to the next power of two <= bs: at most log2(bs)+1
        # compiles per bucket size, and a 1-image tail costs 1 image of
        # compute, not bs (size-heterogeneous datasets put most images in
        # singleton buckets, where padding straight to bs would make the
        # batched loop SLOWER than the reference's batch-1 loop)
        target = bs if k == bs else min(bs, 1 << (k - 1).bit_length())
        target = min(bs, -(-target // shard_n) * shard_n)  # mesh-divisible
        if k < target:
            xs = np.concatenate(
                [xs, np.zeros((target - k, *xs.shape[1:]), xs.dtype)], axis=0)
        depth_b, feats_b = infer(params, jnp.asarray(xs))
        depth_b = jax.device_get(depth_b)[:k, 0]
        feats_b = jax.device_get(feats_b)[:k] if args.save_features else [None] * k
        for (_, (ow, oh, src)), depth, feats in zip(items, depth_b, feats_b):
            write_one(depth, ow, oh, src, feats)

    for pil, src in iter_images(args):
        if pil is None:
            continue
        # bucket input sizes (aspect-preserving, long side <= 512, /32) so the
        # jit cache stays small on heterogeneous datasets; depth is resized
        # back to the source resolution before saving. Same-bucket images are
        # batched --batch_size deep: one dispatch amortizes the per-call
        # latency and fills the MXU (the reference loops batch-1,
        # generate_depth.py:163).
        ow, oh = pil.size
        scale = min(1.0, 512 / max(ow, oh))
        bw = max(32, int(round(ow * scale / 32)) * 32)
        bh = max(32, int(round(oh * scale / 32)) * 32)
        x = _image_to_array(pil.resize((bw, bh), Image.BILINEAR))[None]
        buckets.setdefault((bh, bw), []).append((x, (ow, oh, src)))
        if len(buckets[(bh, bw)]) >= bs:
            flush(buckets.pop((bh, bw)))
    for items in buckets.values():
        flush(items)
    print(f"done: {n} depth maps -> {out_root}")


if __name__ == "__main__":
    parser = get_args_parser()
    args = parser.parse_args()
    if args.output_dir:
        Path(args.output_dir).mkdir(parents=True, exist_ok=True)
    main(args)
