#!/bin/bash
# CLIPA-v2 H/14 336px zero-shot evaluation of a finetuned checkpoint (TPU
# equivalent of the reference scripts/clipav2_vit_h14_i84_224_336_cl32_gap_datacomp1b.sh:
# eval-only invocation with preprocess overrides; no --train-data means main runs
# evaluation only).

python -m open_clip_tpu.train.main \
    --model ViT-H-14-CLIPA-336 \
    --pretrained '/path/to/finetuned_ckpt' \
    --image-interpolation bilinear \
    --image-resize-mode squash \
    --image-mean 0.485 0.456 0.406 \
    --image-std 0.229 0.224 0.225 \
    --seed 0 \
    --imagenet-val '/path/to/imagenet/val'
