#!/bin/bash
# CLIPA pretrain at reduced token budget (TPU equivalent of the reference
# docs/script_examples/clipa/vit_l16/i37_t8_pretrain.sh): a small image size
# (84px -> 36 patch tokens for L/14) and an 8-token text cap make the pretrain
# epochs cheap; a short finetune at full resolution recovers accuracy
# (reference docs/clipa.md). Syntax-mask text reduction is a model-config
# tokenizer kwarg — register a variant with
#   {"text_cfg": {"tokenizer_kwargs": {"reduction_mask": "syntax", "reduction_context_length": 8}}}
# via add_model_config for the masked runs; --force-context-length 8 alone gives
# plain truncation.

python -m open_clip_tpu.train.main \
    --save-frequency 1 \
    --save-most-recent \
    --zeroshot-frequency 1 \
    --train-data '/path/to/laion-400m' \
    --dataset-type webdataset \
    --lr 2.048e-3 \
    --beta1 0.9 \
    --beta2 0.95 \
    --warmup 782 \
    --wd 0.2 \
    --batch-size 8192 \
    --aug-cfg scale='(0.4, 1.0)' \
    --epochs 6 \
    --workers 6 \
    --model ViT-L-14-CLIPA \
    --precision amp_bf16 \
    --local-loss \
    --gather-with-grad \
    --force-image-size 84 \
    --force-context-length 8 \
    --grad-checkpointing \
    --device-preprocess \
    --log-every-n-steps 32 \
    --seed 0 \
    --logs ./logs/ \
    --imagenet-val '/path/to/imagenet/val'
