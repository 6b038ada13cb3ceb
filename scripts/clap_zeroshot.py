"""Audio zero-shot classification for CLAP / NaFlexClap checkpoints
(reference scripts/clap_zeroshot.py).

Loads a trained CLAP (HTSAT / Whisper) or NaFlexClap (spectrogram-ViT) checkpoint and
runs zero-shot audio classification on a Hugging Face audio dataset (e.g. ESC-50):
builds a template-ensemble text classifier from class names and scores
``audio_features @ text_classifier``. The same script serves both tower types — the
factory hands NaFlexClap the NaFlex mel-patch transform and HTSAT the fixed-clip
``AudioPreprocess``.

Eval set: a local wav folder (``root/<classname>/*.wav`` — works fully offline) or
an HF audio dataset id (needs hub access / a local HF cache).

Example:
    python scripts/clap_zeroshot.py \
        --model CLAP-HTSAT-tiny --checkpoint /path/to/checkpoints/epoch_18 \
        --audio-zeroshot-dataset ashraq/esc50 --audio-zeroshot-split train \
        --audio-zeroshot-class-key category --audio-zeroshot-target-key target \
        --batch-size 16 --precision amp_bf16
"""

import argparse

from _common import load_trained_weights  # noqa: E402  (adds repo root to sys.path)

from open_clip_tpu.factory import create_model_and_transforms, get_tokenizer
from open_clip_tpu.train.audio_zero_shot import (
    audio_zero_shot_eval,
    build_audio_zero_shot_dataset,
)


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", required=True,
                        help="model config name (CLAP-* or naflexclap_*).")
    parser.add_argument("--checkpoint", required=True,
                        help="Trained weights: native Orbax dir or torch-format file.")
    parser.add_argument("--use-ema", action="store_true",
                        help="Prefer EMA weights if present.")
    parser.add_argument("--audio-zeroshot-dataset", required=True,
                        help="local wav folder (root/<classname>/*.wav) or HF dataset "
                             "id, e.g. ashraq/esc50.")
    parser.add_argument("--audio-zeroshot-split", default="train")
    parser.add_argument("--audio-zeroshot-audio-key", default="audio")
    parser.add_argument("--audio-zeroshot-target-key", default="target")
    parser.add_argument("--audio-zeroshot-class-key", default="category")
    parser.add_argument("--batch-size", type=int, default=16)
    parser.add_argument("--precision", default="amp_bf16",
                        choices=("fp32", "bf16", "amp_bf16", "amp"))
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"),
                        help="Force a JAX platform (reference --device); default lets "
                             "JAX pick (TPU when available).")
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    print(f"Building {args.model} ...")
    model, _, preprocess_val = create_model_and_transforms(
        args.model, precision=args.precision, load_weights=False)
    load_trained_weights(model, args.checkpoint, use_ema=args.use_ema)
    tokenizer = get_tokenizer(args.model)

    print(f"Loading {args.audio_zeroshot_dataset} (split={args.audio_zeroshot_split}) ...")
    loader = build_audio_zero_shot_dataset(
        args.audio_zeroshot_dataset,
        preprocess_val,
        batch_size=args.batch_size,
        split=args.audio_zeroshot_split,
        audio_key=args.audio_zeroshot_audio_key,
        label_key=args.audio_zeroshot_target_key,
        classname_key=args.audio_zeroshot_class_key,
    )
    print(f"  {len(loader.classnames)} classes; scoring ...")

    metrics = audio_zero_shot_eval(
        model, {"audio-zeroshot": _Split(loader)}, epoch=1,
        tokenizer=tokenizer, classnames=loader.classnames)
    print(f"\n=== {args.model} audio zero-shot on {args.audio_zeroshot_dataset} ===")
    for key, value in metrics.items():
        print(f"  {key}: {100 * value:.2f}%")


class _Split:
    """Adapter: audio_zero_shot_eval reads .classnames / .dataloader off the split."""

    def __init__(self, loader):
        self.dataloader = loader
        self.classnames = loader.classnames


if __name__ == "__main__":
    main()
