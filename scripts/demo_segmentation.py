"""Run a trained segmenter over a folder of unlabeled images (TPU-native).

Mirrors reference ``src/demo_segmentation.py``: center-crop transform at
``res``, flip-TTA probes, per-image dense CRF, raw label-index PNGs saved to
``{output_root}/predictions/{experiment_name}/{linear,cluster}/``. The CRF
runs on-device inside the same jitted program as the backbone.
"""

import os
import sys
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
from PIL import Image

from depthg_tpu.config import cli_overrides, load_config
from depthg_tpu.data import get_transform
from depthg_tpu.inference import make_predict_step
from depthg_tpu.utils.checkpoint_io import (ecfg_from_checkpoint,
                                            fcfg_from_run_cfg, load_segmenter)


class UnlabeledImageFolder:
    def __init__(self, root, transform):
        self.root = root
        self.transform = transform
        self.images = sorted(os.listdir(root))

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        img = Image.open(join(self.root, self.images[index])).convert("RGB")
        return self.transform(img), self.images[index]


def main(argv=None):
    from depthg_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    overrides = cli_overrides(argv if argv is not None else sys.argv[1:])
    cfg = load_config("demo_config.yml", overrides)

    result_dir = join(cfg.output_root, "predictions", cfg.experiment_name)
    os.makedirs(join(result_dir, "cluster"), exist_ok=True)
    os.makedirs(join(result_dir, "linear"), exist_ok=True)

    params, run_cfg = load_segmenter(cfg.model_path)
    fcfg = fcfg_from_run_cfg(run_cfg)
    ecfg = ecfg_from_checkpoint(cfg, params, run_cfg)
    bs = int(cfg.batch_size) * 2
    from depthg_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh_for_batch(bs, cfg.get("n_devices"))
    predict = make_predict_step(fcfg, ecfg, mesh)
    # device-resident params: numpy trees re-transfer ~88 MB per predict call
    # on tunneled hosts (see eval_segmentation.py for the measurement);
    # replicated over the mesh in the sharded path
    params = (mesh_lib.replicate(params, mesh) if mesh.devices.size > 1
              else jax.device_put(params))

    dataset = UnlabeledImageFolder(cfg.image_dir, get_transform(cfg.res, False, "center"))
    for start in range(0, len(dataset), bs):
        items = [dataset[i] for i in range(start, min(start + bs, len(dataset)))]
        imgs = np.stack([it[0] for it in items]).astype(np.float32)
        names = [it[1] for it in items]
        # pad the tail so the jit bucket stays fixed
        pad = bs - imgs.shape[0]
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad, *imgs.shape[1:]), np.float32)])
        lin, clu = predict(params, imgs)
        lin, clu = jax.device_get(lin), jax.device_get(clu)
        for j, name in enumerate(names):
            new_name = ".".join(name.split(".")[:-1]) + ".png"
            Image.fromarray(lin[j].astype(np.uint8)).save(join(result_dir, "linear", new_name))
            Image.fromarray(clu[j].astype(np.uint8)).save(join(result_dir, "cluster", new_name))
        print(f"processed {min(start + bs, len(dataset))}/{len(dataset)}")


if __name__ == "__main__":
    main()
