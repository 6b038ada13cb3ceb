"""CLI argument surface (reference ``src/open_clip_train/params.py``).

Same flag names as the reference where the concept carries over, so existing launch
scripts port mechanically; torch-only knobs (torchcompile, fsdp wrappers, grad scaler)
are replaced by their TPU equivalents (mesh axes, remat, precision names).
"""

from __future__ import annotations

import argparse


def get_default_params(model_name: str):
    model_name = (model_name or "").lower()
    if "vit" in model_name or "coca" in model_name or "siglip" in model_name:
        return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.98, "eps": 1.0e-6}
    return {"lr": 5.0e-4, "beta1": 0.9, "beta2": 0.999, "eps": 1.0e-8}


class ParseKwargs(argparse.Action):
    """--aug-cfg key=val parsing (reference params.py:14-26)."""

    def __call__(self, parser, namespace, values, option_string=None):
        kw = {}
        for value in values:
            key, _, val = value.partition("=")
            try:
                import ast

                kw[key] = ast.literal_eval(val)
            except (ValueError, SyntaxError):
                kw[key] = val
        setattr(namespace, self.dest, kw)


def parse_args(args=None):
    parser = argparse.ArgumentParser("open_clip_tpu training")

    # data
    parser.add_argument("--train-data", type=str, default=None)
    parser.add_argument("--train-data-upsampling-factors", type=str, default=None)
    parser.add_argument("--val-data", type=str, default=None)
    parser.add_argument("--train-num-samples", type=int, default=None)
    parser.add_argument("--val-num-samples", type=int, default=None)
    parser.add_argument("--dataset-type",
                        choices=["webdataset", "csv", "synthetic", "webdataset-audio",
                                 "synthetic-audio", "webdataset-naflex", "synthetic-naflex", "auto"],
                        default="auto")
    # NaFlex token-budget batching (reference --naflex-* flags)
    parser.add_argument("--naflex-seq-lens", type=int, nargs="+", default=[128, 256, 576, 784, 1024])
    parser.add_argument("--naflex-seq-len-probs", type=float, nargs="+", default=None)
    parser.add_argument("--naflex-patch-sizes", type=int, nargs="+", default=[16])
    parser.add_argument("--naflex-patch-size-probs", type=float, nargs="+", default=None)
    parser.add_argument("--naflex-max-tokens", "--naflex-max-tokens-per-batch",
                        dest="naflex_max_tokens", type=int, default=16384)
    parser.add_argument("--naflex-batch-divisor", type=int, default=8)
    parser.add_argument("--naflex-pad-multiple", type=int, default=None,
                        help="round variable seq lens up to multiples of M")
    parser.add_argument("--naflex-max-text-tokens", type=int, default=None)
    parser.add_argument("--naflex-num-train-image-tokens", type=int, default=None,
                        help="epoch size in image tokens instead of samples")
    parser.add_argument("--use-naflex", action="store_true", default=False,
                        help="force the NaFlex data path for a naflex-capable model")
    parser.add_argument("--force-naflex-vision", action="store_true", default=False)
    parser.add_argument("--text-pad-multiple", type=int, default=None)
    parser.add_argument("--length-bucketing", action="store_true", default=False,
                        help="pool+sort samples by token length so similar lengths batch "
                             "together (reference LengthBucketer, naflex_data.py:371-443)")
    parser.add_argument("--bucket-pool", type=int, default=2048)
    parser.add_argument("--bucket-chunk", type=int, default=128)
    parser.add_argument("--bucket-prefetch-pools", type=int, default=0,
                        help=">0 fills+sorts pools on a background thread")
    parser.add_argument("--naflex-loss-scale", type=str, default="none",
                        choices=["none", "linear", "sqrt"],
                        help="scale the loss by (actual batch / --batch-size) for "
                             "token-budget NaFlex batches (reference train.py:319-335)")
    parser.add_argument("--dataset-resampled", action="store_true", default=False)
    parser.add_argument("--csv-separator", type=str, default="\t")
    parser.add_argument("--csv-img-key", type=str, default="filepath")
    parser.add_argument("--csv-caption-key", type=str, default="title")
    parser.add_argument("--wds-caption-key", "--text-key", dest="wds_caption_key",
                        type=str, default="txt",
                        help="caption member suffix or json:field[=w::field2=w] form")
    parser.add_argument("--image-key", type=str, default="jpg;png;jpeg;webp",
                        help="image member suffixes in wds shards")
    parser.add_argument("--json-text-key", type=str, default=None,
                        help="read captions from this field of the .json member")
    parser.add_argument("--json-text-key-probs", type=float, nargs="*", default=None)
    parser.add_argument("--max-image-pixels", type=int, default=25_000_000,
                        help="drop wds images whose w*h exceeds this")
    parser.add_argument("--audio-ext", type=str, default="flac",
                        help="audio member extension in wds shards (wav, flac, mp3, ogg)")
    parser.add_argument("--audio-fill", type=str, default="repeatpad",
                        choices=["repeatpad", "repeat", "pad"])
    parser.add_argument("--audio-trunc", type=str, default="rand_trunc",
                        choices=["rand_trunc", "fusion"])
    parser.add_argument("--audio-fusion", action="store_true", default=False,
                        help="HTSAT fusion preprocessing for long clips (mel_fusion stack)")
    parser.add_argument("--audio-int16-normalize", action="store_true", default=False)
    parser.add_argument("--audio-layer-decay", type=float, default=None)
    parser.add_argument("--audio-zeroshot-dataset", type=str, default=None)
    parser.add_argument("--audio-zeroshot-split", type=str, default="test")
    parser.add_argument("--audio-zeroshot-audio-key", type=str, default="audio")
    parser.add_argument("--audio-zeroshot-class-key", type=str, default="category")
    parser.add_argument("--audio-zeroshot-target-key", type=str, default="target")
    parser.add_argument("--audio-zeroshot-template", type=str, default=None)
    parser.add_argument("--audio-zeroshot-workers", type=int, default=2)
    parser.add_argument("--imagenet-val", type=str, default=None)
    parser.add_argument("--imagenet-v2", type=str, default=None)
    parser.add_argument("--workers", type=int, default=4)

    # logging / experiment
    parser.add_argument("--logs", type=str, default="./logs/")
    parser.add_argument("--log-local", action="store_true", default=False)
    parser.add_argument("--name", type=str, default=None)
    parser.add_argument("--report-to", type=str, default="",
                        help="comma-separated: tensorboard, wandb, trackio (jsonl always on)")
    parser.add_argument("--wandb-notes", type=str, default="")
    parser.add_argument("--wandb-project-name", type=str, default="open-clip")
    parser.add_argument("--log-every-n-steps", type=int, default=100)
    parser.add_argument("--log-metric-every-n-steps", type=int, default=10,
                        help="writer cadence (denser than the console line)")
    parser.add_argument("--train-loss-ema-samples", type=int, default=50000,
                        help="smoothing horizon in samples for the console loss EMA")
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--copy-codebase", action="store_true", default=False,
                        help="snapshot the package source into the log dir")
    parser.add_argument("--cache-dir", type=str, default=None,
                        help="override the HF hub cache dir for model/tokenizer files")
    parser.add_argument("--val-retrieval-chunk-size", type=int, default=4096)
    parser.add_argument("--val-retrieval-precision", type=str, default="fp32",
                        choices=["fp32", "model"])
    parser.add_argument("--pretrained-image", type=str, default=None,
                        help="load only the vision tower from this checkpoint")
    parser.add_argument("--pretrained-audio", type=str, default=None,
                        help="load only the audio tower from this checkpoint")

    # core training
    parser.add_argument("--model", type=str, default="ViT-B-32")
    parser.add_argument("--pretrained", type=str, default="")
    parser.add_argument("--batch-size", type=int, default=64, help="per-host batch size")
    parser.add_argument("--epochs", type=int, default=32)
    parser.add_argument("--epochs-cooldown", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--beta1", type=float, default=None)
    parser.add_argument("--beta2", type=float, default=None)
    parser.add_argument("--eps", type=float, default=None)
    parser.add_argument("--wd", type=float, default=0.2)
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--opt", type=str, default="adamw")
    parser.add_argument("--lock-image-freeze-bn-stats", action="store_true", default=False,
                        help="when the image tower is locked, also freeze BN running stats")
    parser.add_argument("--use-switchback", action="store_true", default=False,
                        help="int8 SwitchBack forward for transformer MLP linears "
                             "(reference --use-bnb-linear)")
    parser.add_argument("--warmup", type=int, default=10000)
    parser.add_argument("--lr-scheduler", type=str, default="cosine",
                        choices=["cosine", "const", "const-cooldown"])
    parser.add_argument("--lr-cooldown-end", type=float, default=0.0)
    parser.add_argument("--lr-cooldown-power", type=float, default=1.0)
    parser.add_argument("--accum-freq", type=int, default=1)
    parser.add_argument("--grad-clip-norm", type=float, default=None)
    parser.add_argument("--layer-decay", type=float, default=None)
    parser.add_argument("--image-layer-decay", "--visual-layer-decay",
                        dest="image_layer_decay", type=float, default=None,
                        help="per-tower LLRD override (falls back to --layer-decay)")
    parser.add_argument("--text-layer-decay", type=float, default=None)
    parser.add_argument("--opt-kwargs", nargs="*", action=ParseKwargs, default={})
    parser.add_argument("--opt-fallback-list", type=str, nargs="*", default=None,
                        help="param-name glob patterns routed to the AdamW fallback of "
                             "hybrid optimizers (muon)")
    parser.add_argument("--wd-exclude", type=str, nargs="*", default=[],
                        dest="wd_exclude_patterns",
                        help="extra param-name glob patterns that skip weight decay")
    parser.add_argument("--skip-scheduler", action="store_true", default=False,
                        help="constant lr, no decay")
    parser.add_argument("--text-pooler-own-group", dest="text_pooler_in_head",
                        action="store_false", default=True)

    # precision / memory
    parser.add_argument("--precision", type=str, default="amp_bf16",
                        choices=["amp", "amp_bf16", "bf16", "pure_bf16", "fp16", "fp32"])
    parser.add_argument("--grad-checkpointing", action="store_true", default=False)
    parser.add_argument("--remat-policy", type=str, default="none",
                        choices=["none", "names", "names_mm", "dots", "dots_no_batch"],
                        help="what jax.checkpoint saves under --grad-checkpointing: "
                             "'none' = full remat (save nothing; lowest memory), "
                             "'names' = save tagged block-matmul inputs (the ViT-B-32 "
                             "frontier winner on v5e: ~4%% faster than full remat at "
                             "batch 256, scripts/bench_sweep.py), 'dots'/'dots_no_batch' "
                             "= XLA dot-output policies (highest memory)")
    parser.add_argument("--scan-unroll", type=int, default=1,
                        help="lax.scan unroll factor for the stacked transformer blocks")

    # mesh / parallelism (TPU equivalents of --ddp/--fsdp flags)
    parser.add_argument("--mesh-data", type=int, default=-1, help="data-parallel axis size (-1: all devices)")
    parser.add_argument("--mesh-fsdp", type=int, default=1, help="fsdp (param-shard) axis size")
    parser.add_argument("--mesh-tensor", type=int, default=1,
                        help="tensor-parallel axis size (Megatron-style column/row "
                             "sharding via GSPMD; superset over the reference)")
    # multi-host (reference distributed.py:102-167; here jax.distributed.initialize)
    parser.add_argument("--dist-coordinator", type=str, default=None,
                        help="host:port of process 0 for multi-host init (or MASTER_ADDR/OCT_COORDINATOR env)")
    parser.add_argument("--dist-num-processes", type=int, default=None)
    parser.add_argument("--dist-process-id", type=int, default=None)
    parser.add_argument("--dist-auto", action="store_true", default=False,
                        help="bare jax.distributed.initialize() (self-configures on TPU pod slices)")
    parser.add_argument("--local-loss", action="store_true", default=True)
    parser.add_argument("--no-local-loss", dest="local_loss", action="store_false")
    parser.add_argument("--gather-with-grad", action="store_true", default=True)

    # model config overrides
    parser.add_argument("--force-quick-gelu", action="store_true", default=False)
    parser.add_argument("--force-custom-text", action="store_true", default=False)
    parser.add_argument("--force-patch-dropout", type=float, default=None)
    parser.add_argument("--force-image-size", type=int, nargs="+", default=None)
    parser.add_argument("--force-context-length", type=int, default=None)
    parser.add_argument("--lock-image", action="store_true", default=False)
    parser.add_argument("--lock-image-unlocked-groups", type=int, default=0)
    parser.add_argument("--lock-text", action="store_true", default=False)
    parser.add_argument("--lock-text-unlocked-layers", type=int, default=0)
    parser.add_argument("--lock-text-freeze-layer-norm", action="store_true", default=False)
    parser.add_argument("--aug-cfg", nargs="*", action=ParseKwargs, default={})
    # preprocess overrides (reference params.py:444-458)
    parser.add_argument("--image-mean", type=float, nargs="+", default=None, metavar="MEAN",
                        help="override the default image mean")
    parser.add_argument("--image-std", type=float, nargs="+", default=None, metavar="STD",
                        help="override the default image std")
    parser.add_argument("--image-interpolation", default=None, type=str,
                        choices=["bicubic", "bilinear", "random"],
                        help="override the default resize interpolation")
    parser.add_argument("--image-resize-mode", default=None, type=str,
                        choices=["shortest", "longest", "squash"],
                        help="override the default resize (& crop) mode for eval")

    # losses
    parser.add_argument("--siglip", action="store_true", default=False)
    parser.add_argument("--loss-dist-impl", type=str, default="bidir")
    parser.add_argument("--coca-caption-loss-weight", type=float, default=2.0)
    parser.add_argument("--coca-contrastive-loss-weight", type=float, default=1.0)
    parser.add_argument("--distill-model", type=str, default=None)
    parser.add_argument("--distill-pretrained", type=str, default=None)

    # checkpointing
    parser.add_argument("--save-frequency", type=int, default=1)
    parser.add_argument("--save-most-recent", action="store_true", default=False)
    parser.add_argument("--resume", type=str, default=None, help="path or 'latest'")
    parser.add_argument("--checkpoint-format", type=str, default="orbax", choices=["orbax", "pt-interop"])
    parser.add_argument("--delete-previous-checkpoint", action="store_true", default=False)

    # remote sync (reference --remote-sync*)
    parser.add_argument("--remote-sync", type=str, default=None)
    parser.add_argument("--remote-sync-frequency", type=int, default=300)
    parser.add_argument("--remote-sync-protocol", choices=["s3", "fsspec"], default="fsspec")
    # profiling
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="capture a jax.profiler trace of a few train steps to this dir")

    # eval / misc
    parser.add_argument("--val-frequency", type=int, default=1)
    parser.add_argument("--zeroshot-frequency", type=int, default=2)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ema", type=float, default=None, help="EMA decay (e.g. 0.9998)")
    parser.add_argument("--device-preprocess", action="store_true", default=False,
                        help="uint8 host batches; fused resize/normalize on device")
    parser.add_argument("--native-decode-threads", type=int, default=0,
                        help="decode train JPEGs via the C++ libjpeg stage with this many "
                             "threads (requires --device-preprocess; 0 = PIL workers)")

    # torch-only knobs accepted for launch-script compatibility; each has a TPU-side
    # replacement (jit replaces torchcompile; the mesh replaces DDP/FSDP wrappers;
    # device placement is implicit; SyncBN is unneeded under SPMD batch sharding)
    compat = parser.add_argument_group("torch launch-script compatibility (no-ops)")
    for flag, kw in (
        ("--torchcompile", dict(action="store_true")),
        ("--torchcompile-backend", dict(type=str, default=None)),
        ("--torchcompile-mode", dict(type=str, default=None)),
        ("--torchcompile-strategy", dict(type=str, default=None)),
        ("--fsdp", dict(action="store_true")),
        ("--fsdp-checkpoint", dict(action="store_true")),
        ("--fsdp-no-reshard-after-forward", dict(action="store_true")),
        ("--fsdp-offload-cpu", dict(action="store_true")),
        ("--ddp-static-graph", dict(action="store_true")),
        ("--dist-backend", dict(type=str, default=None)),
        ("--dist-url", dict(type=str, default=None)),
        ("--device", dict(type=str, default=None)),
        ("--no-set-device-rank", dict(action="store_true")),
        ("--use-bn-sync", dict(action="store_true")),
        ("--audio-multiprocessing-context", dict(type=str, default=None)),
        ("--audio-zeroshot-multiprocessing-context", dict(type=str, default=None)),
    ):
        compat.add_argument(flag, **kw, help=argparse.SUPPRESS)
    parser.add_argument("--use-bnb-linear", type=str, default=None,
                        help="reference int8 flag; maps onto the SwitchBack Pallas path "
                             "(same as --use-switchback)")

    ns = parser.parse_args(args)
    if ns.use_bnb_linear:
        ns.use_switchback = True
    if ns.audio_fusion:
        ns.audio_trunc = "fusion"
    if ns.json_text_key:
        ns.wds_caption_key = f"json:{ns.json_text_key}"

    defaults = get_default_params(ns.model)
    for k, v in defaults.items():
        if getattr(ns, k, None) is None:
            setattr(ns, k, v)

    ns.world_size = 1  # overwritten by main() after jax.distributed init
    ns.rank = 0
    return ns
