"""Download pretrained backbones / checkpoints (reference ``src/download_models.py``
+ the DINO hub weights the featurizer needs, ``src/modules.py:41-50``).

Zero-egress environments fail fast with the URL list for manual staging.
"""

import os
import sys
import urllib.error
import urllib.request
from os.path import exists, join

DINO_URLS = {
    "dino_deitsmall16_pretrain.pth":
        "https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "dino_deitsmall8_300ep_pretrain.pth":
        "https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_300ep_pretrain/dino_deitsmall8_300ep_pretrain.pth",
    "dino_vitbase16_pretrain.pth":
        "https://dl.fbaipublicfiles.com/dino/dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "dino_vitbase8_pretrain.pth":
        "https://dl.fbaipublicfiles.com/dino/dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
}
ZOE_URLS = {
    "ZoeD_M12_N.pt":
        "https://github.com/isl-org/ZoeDepth/releases/download/v1.0/ZoeD_M12_N.pt",
}
STEGO_MODEL_ROOT = "https://marhamilresearch4.blob.core.windows.net/stego-public/models/models/"
STEGO_SAVED_ROOT = "https://marhamilresearch4.blob.core.windows.net/stego-public/saved_models/"
STEGO_MODELS = ["moco_v2_800ep_pretrain.pth.tar", "model_epoch_0720_iter_085000.pth", "picie.pkl"]
STEGO_SAVED = ["cityscapes_vit_base_1.ckpt", "cocostuff27_vit_base_5.ckpt",
               "picie_and_probes.pth", "potsdam_test.ckpt"]


def fetch(url, target):
    if exists(target):
        print(f"Found {target}, skipping")
        return
    print(f"Downloading {url} -> {target}")
    try:
        urllib.request.urlretrieve(url, target)
    except (urllib.error.URLError, OSError) as e:
        print(f"  FAILED ({e}) — zero-egress? stage manually from {url}")


def main(root="models"):
    models_dir = join(root, "backbones")
    saved_dir = join(root, "checkpoints")
    os.makedirs(models_dir, exist_ok=True)
    os.makedirs(saved_dir, exist_ok=True)
    for name, url in {**DINO_URLS, **ZOE_URLS}.items():
        fetch(url, join(models_dir, name))
    for name in STEGO_MODELS:
        fetch(STEGO_MODEL_ROOT + name, join(models_dir, name))
    for name in STEGO_SAVED:
        fetch(STEGO_SAVED_ROOT + name, join(saved_dir, name))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "models")
