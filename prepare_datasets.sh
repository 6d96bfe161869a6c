#!/bin/bash
# Dataset preparation recipes (the reference splits these across
# crop_datasets.sh / depth_for_dataset.sh / precompute_knns.sh — example
# invocations expressed against this framework's CLIs). Run order per
# dataset: depth -> five-crop -> KNN, then train via paper_reproduction.sh.
# Set DATA / OUT / ZOE first.

DATA=${DATA:-./data}
OUT=${OUT:-./outputs}
ZOE=${ZOE:-models/backbones/ZoeD_M12_N.pt}

# 1. Depth maps (ZoeDepth; --model midas for the DPT_Large variant).
#    Batched per size bucket and data-parallel over all visible devices.
#    Output lands under {output_dir}/{source parent dir}/ — for cocostuff
#    the split is already encoded by train2017/val2017, so point output_dir
#    at depth/ itself (the Coco reader opens depth/{train2017}/{id}_*.png).
python scripts/generate_depth.py --weights $ZOE --dataset cocostuff \
    --data_dir $DATA --split train --output_dir $DATA/cocostuff/depth
python scripts/generate_depth.py --weights $ZOE --dataset cocostuff \
    --data_dir $DATA --split val --output_dir $DATA/cocostuff/depth
# python scripts/generate_depth.py --weights $ZOE --dataset potsdam ...
# python scripts/generate_depth.py --weights $ZOE --dataset cityscapes ...

# 2. Five-crop datasets (with depth carried through the crop).
python scripts/crop_datasets.py data_dir=$DATA output_root=$DATA \
    crop_datasets=[cocostuff27] crop_image_sets=[train] depth_type=zoedepth
# python scripts/crop_datasets.py data_dir=$DATA output_root=$DATA \
#     crop_datasets=[nyuv2] crop_image_sets=[train] depth_type=zoedepth

# 3. KNN neighbor files (sharded MXU top-30 over the device mesh).
python scripts/precompute_knns.py data_dir=$DATA output_root=$OUT \
    model_type=vit_small dim=70 knn_datasets=[cocostuff27] \
    knn_crop_types=[five] knn_image_sets=[train]
# python scripts/precompute_knns.py ... model_type=vit_base dim=90 ...
