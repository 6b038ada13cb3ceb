#!/bin/bash
# CLIPA-v2 H/14 stage 2: 224px / 32-token finetune from the 84px pretrain (TPU
# equivalent of the reference scripts/h14_224_32_finetune.sh).

python -m open_clip_tpu.train.main \
    --save-frequency 1 \
    --save-most-recent \
    --zeroshot-frequency 1 \
    --train-data '/path/to/laion-2b' \
    --dataset-type webdataset \
    --lr 2.56e-5 \
    --beta1 0.9 \
    --beta2 0.95 \
    --warmup 3072 \
    --wd 0.2 \
    --batch-size 1024 \
    --aug-cfg scale='(0.4, 1.0)' \
    --epochs 1 \
    --train-num-samples 131072000 \
    --workers 6 \
    --model ViT-H-14-CLIPA \
    --pretrained '/path/to/pretrain_ckpt' \
    --precision amp_bf16 \
    --local-loss \
    --gather-with-grad \
    --grad-checkpointing \
    --device-preprocess \
    --log-every-n-steps 256 \
    --seed 0 \
    --logs ./logs/ \
    --imagenet-val '/path/to/imagenet/val'
