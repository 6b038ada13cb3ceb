#!/bin/bash
# CLIPA-v2 H/14 stage 1: 84px pretrain at 64k global batch (TPU equivalent of the
# reference scripts/h14_84_8_pretrain.sh; lr 2.048e-3 is tuned for the 64k batch).
# Run one process per TPU host; batch-size is per process.

python -m open_clip_tpu.train.main \
    --save-frequency 1 \
    --save-most-recent \
    --zeroshot-frequency 1 \
    --train-data '/path/to/laion-2b' \
    --dataset-type webdataset \
    --lr 2.048e-3 \
    --beta1 0.9 \
    --beta2 0.95 \
    --warmup 782 \
    --wd 0.2 \
    --batch-size 4096 \
    --aug-cfg scale='(0.4, 1.0)' color_jitter='(0.32, 0.32, 0.32, 0.08)' color_jitter_prob=0.8 gray_scale_prob=0.2 \
    --epochs 7 \
    --workers 6 \
    --model ViT-H-14-CLIPA \
    --precision amp_bf16 \
    --local-loss \
    --gather-with-grad \
    --force-image-size 84 \
    --force-context-length 8 \
    --grad-checkpointing \
    --log-every-n-steps 32 \
    --seed 0 \
    --logs ./logs/ \
    --imagenet-val '/path/to/imagenet/val' \
    --name clipav2_h14_i84_t8 \
    --report-to wandb \
    --wandb-project-name clipav2
