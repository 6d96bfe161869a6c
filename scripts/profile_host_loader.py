"""Profile the host-side data path: where does per-item time go?

The eval CLI is host-bound (docs/PERFORMANCE.md: 1.57 img/s e2e vs ~79 img/s
device rate) and this host has ONE core, so the fix must make decode CHEAPER
or overlap it, not parallelize it. This script breaks one `ContrastiveSegDataset`
item fetch into stages (JPEG decode, resize, normalize, label decode, the
rest) on a synthetic 320px dataset shaped like the eval workload
(reference workload: ``src/eval_segmentation.py:125-141``).

Usage: python scripts/profile_host_loader.py [--n 64] [--res 320] [--src 480]
"""

import argparse
import os
import sys
import tempfile
import time
from os.path import dirname, abspath, join

sys.path.insert(0, dirname(dirname(abspath(__file__))))
sys.path.insert(0, join(dirname(dirname(abspath(__file__))), "tests"))

import numpy as np
from PIL import Image


def timeit(fn, n, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--res", type=int, default=320)
    ap.add_argument("--src", type=int, default=480,
                    help="stored image size (real COCO crops are ~480px)")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)

    from synthetic_data import make_cropped_dataset, make_nns
    from depthg_tpu.data import ContrastiveSegDataset, DataLoader, get_transform

    root = tempfile.mkdtemp(prefix="hostprof_")
    # realistic-ish content: smooth fields compress like photos, not noise
    rng = np.random.default_rng(0)
    make_cropped_dataset(root, crop_type="five", n=args.n, size=args.src,
                         splits=("val",))
    base = join(root, "cropped", "cocostuff27_five_crop_0.5")
    for i in range(args.n):
        low = rng.random((12, 12, 3))
        img = np.kron(low, np.ones((args.src // 12 + 1, args.src // 12 + 1, 1)))
        img = (img[:args.src, :args.src] * 255).astype(np.uint8)
        Image.fromarray(img).save(join(base, "img", "val", f"{i}.jpg"))
    make_nns(root, "vit_small", "cocostuff27", "val", "five", 224, args.n)

    from depthg_tpu.config import Config
    run_cfg = Config({"dataset_name": "cocostuff27", "model_type": "vit_small",
                      "res": 224,
                      # this script exists to measure DECODE cost — pin the
                      # decoded-image LRU off so every row pays the real
                      # per-item price (the train CLI enables it instead)
                      "image_cache_mb": 0})
    # the eval CLI uses crop_type=None (raw COCO val); the cropped reader has
    # the same decode+transform shape and works off the synthetic tree
    run_cfg["crop_ratio"] = 0.5
    ds = ContrastiveSegDataset(
        data_dir=root, dataset_name="cocostuff27", crop_type="five",
        image_set="val", transform=get_transform(args.res, False, "center"),
        target_transform=get_transform(args.res, True, "center"),
        cfg=run_cfg, mask=True)

    img_path = join(base, "img", "val", "0.jpg")
    lbl_path = join(base, "label", "val", "0.png")

    t_open = timeit(lambda: Image.open(img_path).load(), args.reps)
    t_open_draft = timeit(
        lambda: (lambda im: (im.draft("RGB", (args.res, args.res)), im.load()))
        (Image.open(img_path)), args.reps)
    tf = get_transform(args.res, False, "center")
    ttf = get_transform(args.res, True, "center")
    im = Image.open(img_path); im.load()
    lb = Image.open(lbl_path); lb.load()
    t_tf = timeit(lambda: tf(im, np.random.default_rng(0)), args.reps)
    t_ttf = timeit(lambda: ttf(lb, np.random.default_rng(0)), args.reps)
    t_lopen = timeit(lambda: Image.open(lbl_path).load(), args.reps)
    t_item = timeit(lambda: ds[0], args.reps)

    print(f"stored {args.src}px -> res {args.res}px, per item:")
    print(f"  jpeg open+decode        {t_open * 1e3:8.2f} ms")
    print(f"  jpeg decode w/ draft    {t_open_draft * 1e3:8.2f} ms")
    print(f"  img transform           {t_tf * 1e3:8.2f} ms")
    print(f"  label png open+decode   {t_lopen * 1e3:8.2f} ms")
    print(f"  label transform         {t_ttf * 1e3:8.2f} ms")
    print(f"  FULL dataset[i]         {t_item * 1e3:8.2f} ms")

    for workers in (1, 4):
        loader = DataLoader(ds, 16, shuffle=False, num_workers=workers)
        t0 = time.perf_counter()
        n = 0
        for b in loader:
            n += b["img"].shape[0]
        dt = time.perf_counter() - t0
        print(f"  DataLoader workers={workers}: {n / dt:6.1f} img/s "
              f"({dt / n * 1e3:.2f} ms/img)")


if __name__ == "__main__":
    main()
