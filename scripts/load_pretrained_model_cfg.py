"""Print the run config embedded in a checkpoint (reference
``src/load_pretrained_model_cfg.py``). Accepts Lightning ``.ckpt`` files and
native orbax directories."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from depthg_tpu.utils.checkpoint_io import load_segmenter


def main():
    parser = argparse.ArgumentParser(description="Load pretrained model cfg")
    parser.add_argument("--path", required=True, type=str)
    args = parser.parse_args()
    print(args.path)
    _, cfg = load_segmenter(args.path)
    print(cfg.to_yaml())


if __name__ == "__main__":
    main()
