#!/bin/bash
# Paper training recipes (hyperparameters per reference paper_reproduction.sh),
# expressed against this framework's CLI. Set DATA/OUT/DINO_S/DINO_B first.

DATA=${DATA:-./data}
OUT=${OUT:-./outputs}
DINO_S=${DINO_S:-models/backbones/dino_deitsmall8_300ep_pretrain.pth}
DINO_B=${DINO_B:-models/backbones/dino_vitbase8_pretrain.pth}

# COCO-Stuff27, ViT-S/8
python scripts/train_segmentation.py data_dir=$DATA output_root=$OUT \
    pretrained_weights=$DINO_S dataset_name=cocostuff27 model_type=vit_small dim=70 \
    depth_sampling=fps feature_samples=11 depth_feat_correlation_loss=True \
    depth_feat_weight=0.19 depth_feat_shift=0.03 \
    depth_loss_decay=True depth_loss_decay_factor=0.6 decay_every_steps=250 \
    max_steps=5000 experiment_name=cocostuff_vits

# COCO-Stuff27, ViT-B/8
python scripts/train_segmentation.py data_dir=$DATA output_root=$OUT \
    pretrained_weights=$DINO_B dataset_name=cocostuff27 model_type=vit_base dim=90 \
    depth_sampling=fps feature_samples=12 depth_feat_correlation_loss=True \
    depth_feat_weight=0.160 depth_feat_shift=0.0359 \
    depth_loss_decay=True depth_loss_decay_factor=0.64 decay_every_steps=300 \
    max_steps=7000 experiment_name=cocostuff_vitb

# Cityscapes, ViT-B/8
python scripts/train_segmentation.py data_dir=$DATA output_root=$OUT \
    pretrained_weights=$DINO_B dataset_name=cityscapes model_type=vit_base dim=100 \
    depth_sampling=none pointwise=False depth_feat_correlation_loss=True \
    depth_feat_weight=0.09 max_steps=7000 experiment_name=cityscapes_vitb

# Potsdam, ViT-S/8
python scripts/train_segmentation.py data_dir=$DATA output_root=$OUT \
    pretrained_weights=$DINO_S dataset_name=potsdam model_type=vit_small dim=90 \
    depth_sampling=fps depth_feat_correlation_loss=True \
    depth_feat_weight=0.13 depth_feat_shift=0.14 \
    max_steps=5000 experiment_name=potsdam_vits
