"""Precompute dataset-wide image-level KNNs (TPU-native).

Mirrors reference ``src/precompute_knns.py``: for each (crop_type, image_set,
dataset), embed every image with the frozen backbone (mean-pooled, normalized,
res 392), compute top-30 cosine neighbors, write ``nns_*.npz`` in the same
format. The N x N similarity pass runs as sharded MXU matmuls
(``parallel.knn``) instead of a chunked host loop.
"""

import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from depthg_tpu.config import cli_overrides, load_config
from depthg_tpu.data import ContrastiveSegDataset, DataLoader, get_transform
from depthg_tpu.parallel import knn as knn_lib
from depthg_tpu.parallel import mesh as mesh_lib
from depthg_tpu.utils.checkpoint_io import fcfg_from_run_cfg


def embed_dataset(dataset, fcfg, params, batch_size, num_workers, precision=None,
                  feats_fn=None):
    """``feats_fn`` (non-ViT backbones, reference src/precompute_knns.py:60-64)
    maps (params, img) -> dense feature map; pooling/normalization is shared."""
    import jax
    import jax.numpy as jnp

    from depthg_tpu.ops.correlation import norm

    @jax.jit
    def embed(img):
        if feats_fn is not None:
            return norm(feats_fn(params, img).mean(axis=(2, 3)), axis=1)
        return knn_lib.pooled_features(params, img, fcfg, precision)

    feats = []
    loader = DataLoader(dataset, batch_size, shuffle=False, num_workers=num_workers,
                        drop_last=False)
    n_done = 0
    for batch in loader:
        img = batch["img"].astype(np.float32)
        pad = batch_size - img.shape[0]
        if pad:  # keep one jit bucket
            img = np.concatenate([img, np.zeros((pad, *img.shape[1:]), np.float32)])
        out = np.asarray(embed(jnp.asarray(img)))
        feats.append(out[: img.shape[0] - pad if pad else batch_size])
        n_done += img.shape[0] - pad
        if n_done % (batch_size * 20) == 0:
            print(f"  embedded {n_done}/{len(dataset)}")
    return np.concatenate(feats, axis=0)


def main(argv=None):
    from depthg_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    overrides = cli_overrides(argv if argv is not None else sys.argv[1:])
    cfg = load_config("local_config.yml", overrides)

    data_dir = cfg.data_dir
    os.makedirs(join(data_dir, "nns"), exist_ok=True)

    image_sets = list(cfg.get("knn_image_sets", ["train", "val"]))
    dataset_names = list(cfg.get("knn_datasets", ["cocostuff27", "cityscapes", "potsdam"]))
    crop_types = list(cfg.get("knn_crop_types", ["five", None]))
    # the reference hardcodes 392 here while training looks the file up under
    # cfg.res (src/precompute_knns.py:50 vs src/data.py:1056) — defaulting to
    # cfg.res keeps the pipeline coherent out of the box; override via knn_res.
    res = int(cfg.get("knn_res", cfg.res))
    batch_size = 128 if cfg.model_type == "vit_small" else 64

    import jax

    from depthg_tpu.models import pyramid as pyramid_lib

    fcfg = feats_fn = None
    if cfg.model_type in pyramid_lib._MODEL_FILES:
        # non-ViT backbones go through load_model, mirroring the reference's
        # cut_model path (src/precompute_knns.py:60-64)
        try:
            params, feats_fn, _ = pyramid_lib.load_model(
                cfg.model_type, join(cfg.output_root, "data"))
        except FileNotFoundError as e:
            print(f"WARNING: {e}; using random backbone weights — neighbor "
                  "quality will be meaningless.")
            feats_fn = {"vgg11": pyramid_lib.vgg11_features,
                        "densenet121": pyramid_lib.densenet121_features}.get(
                cfg.model_type, pyramid_lib.resnet50_last_features)
            init = {"vgg11": pyramid_lib.vgg11_init,
                    "densenet121": pyramid_lib.densenet121_init}.get(
                cfg.model_type, pyramid_lib.resnet50_init)
            params = init(jax.random.PRNGKey(0))
    else:
        from depthg_tpu.models.featurizer import featurizer_init
        from depthg_tpu.utils.ckpt import load_dino_pth

        fcfg = fcfg_from_run_cfg(cfg)
        if cfg.get("pretrained_weights"):
            params = {"vit": load_dino_pth(cfg.pretrained_weights)}
            params = __import__("depthg_tpu.utils.ckpt", fromlist=["to_jax"]).to_jax(params)
        else:
            print("WARNING: no pretrained_weights given (zero-egress environment); "
                  "using random backbone weights — neighbor quality will be "
                  "meaningless.")
            params = {"vit": featurizer_init(jax.random.PRNGKey(0), fcfg)["vit"]}

    mesh = mesh_lib.make_mesh(cfg.get("n_devices"))

    for crop_type in crop_types:
        for image_set in image_sets:
            for dataset_name in dataset_names:
                nice_name = cfg.dir_dataset_name if dataset_name == "directory" else dataset_name
                cache = join(data_dir, "nns",
                             f"nns_{cfg.model_type}_{nice_name}_{image_set}_{crop_type}_{res}.npz")
                if os.path.exists(cache):
                    print(f"Found {cache}")
                    continue
                print(f"{cache} not found, computing")
                try:
                    dataset = ContrastiveSegDataset(
                        data_dir=data_dir, dataset_name=dataset_name,
                        crop_type=crop_type, image_set=image_set,
                        transform=get_transform(res, False, "center"),
                        target_transform=get_transform(res, True, "center"),
                        cfg=cfg)
                except (FileNotFoundError, OSError) as e:
                    print(f"  skipping (data not present): {e}")
                    continue
                feats = embed_dataset(dataset, fcfg, params, batch_size,
                                      cfg.num_workers, cfg.get("matmul_precision"),
                                      feats_fn=feats_fn)
                nns = knn_lib.topk_neighbors(feats, k=30,
                                             mesh=mesh if mesh.devices.size > 1 else None)
                np.savez_compressed(cache, nns=nns)
                print(f"Saved NNs -> {cache} ({nns.shape})")


if __name__ == "__main__":
    main()
