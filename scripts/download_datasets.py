"""Download the STEGO-hosted dataset archives (reference ``src/download_datasets.py``).

Uses urllib (no wget dependency); in zero-egress environments this fails fast
with a clear message listing the URLs so the archives can be staged manually.
"""

import os
import sys
import urllib.error
import urllib.request
from os.path import join

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthg_tpu.config import cli_overrides, load_config

URL_BASE = "https://marhamilresearch4.blob.core.windows.net/stego-public/pytorch_data/"
DATASETS = ["potsdam", "cityscapes", "cocostuff", "potsdamraw"]


def main(argv=None):
    cfg = load_config("local_config.yml",
                      cli_overrides(argv if argv is not None else sys.argv[1:]))
    data_dir = cfg.data_dir
    names = list(cfg.get("download_datasets", DATASETS))
    os.makedirs(data_dir, exist_ok=True)
    if "nyuv2" in names:
        # NYUv2 ships as separate rgb/seg13/sn/depth archives with its own
        # prep pipeline (reference src/data.py:1144-1277)
        from depthg_tpu.data.nyuv2_prep import prepare_nyuv2

        names.remove("nyuv2")
        prepare_nyuv2(join(data_dir, "nyuv2"))
    for name in names:
        target = join(data_dir, name + ".zip")
        if os.path.exists(join(data_dir, name)) or os.path.exists(target):
            print(f"Found {name}, skipping download")
            continue
        url = URL_BASE + name + ".zip"
        print(f"Downloading {url} -> {target}")
        try:
            urllib.request.urlretrieve(url, target)
        except (urllib.error.URLError, OSError) as e:
            raise SystemExit(
                f"Download failed ({e}). This environment may have no network "
                f"egress — stage the archive manually at {target} from:\n  {url}")


if __name__ == "__main__":
    main()
