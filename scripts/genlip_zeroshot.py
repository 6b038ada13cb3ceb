"""Generative zero-shot image classification for GenLIP (naflexgenlip)
(reference scripts/genlip_zeroshot.py).

GenLIP has no contrastive image/text embedding, so we classify *generatively*: each
class is scored by the model's length-normalized conditional log-likelihood
``log P(caption | image)`` over templated captions, argmax over classes.

TPU-native upgrade over the reference: the reference recomputes the image prefix for
every caption chunk and its docstring concedes full-scale eval "needs a KV-cache (not
here)". Here the prefix runs through the trunk ONCE per image (``prefix_cache``, exact
by the prefix-LM property) and each chunk processes only its text positions against the
cached K/V — with 1000 classes x 80 templates at 256 image tokens that is ~16x fewer
trunk token-passes per image, making full 50k-val x 80-template eval tractable. Both
stages are jitted once (fixed shapes: all caption chunks pad to the global max length).

Example:
    python scripts/genlip_zeroshot.py \
        --model naflexgenlip_b16_224 --checkpoint /path/to/ckpt \
        --imagenet-val /data/imagenet/validation \
        --seq-len 256 --templates simple --num-images 2000 --precision bf16
"""
import argparse
import functools
import os
import time

import numpy as np

from _common import load_trained_weights  # noqa: E402  (adds repo root to sys.path)


def list_imagefolder(root, seed, limit=None):
    """(path, class_idx) pairs from a class-subdir layout (ImageFolder semantics:
    classes = sorted subdir names), shuffled deterministically."""
    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    samples = []
    exts = (".jpg", ".jpeg", ".png", ".webp", ".bmp")
    for ci, cls in enumerate(classes):
        cdir = os.path.join(root, cls)
        for fn in sorted(os.listdir(cdir)):
            if fn.lower().endswith(exts):
                samples.append((os.path.join(cdir, fn), ci))
    rng = np.random.default_rng(seed)
    rng.shuffle(samples)
    if limit:
        samples = samples[:limit]
    return samples, classes


def build_caption_chunks(tokenizer, classnames, templates, pad_id, chunk_size):
    """Tokenize every (class, template) caption once; fixed-shape chunks
    (text [chunk, Lmax], valid, class_idx; -1 rows are padding) so XLA compiles one
    scoring program (reference build_caption_chunks pads per-chunk -> many shapes)."""
    captions, class_idx = [], []
    for ci, name in enumerate(classnames):
        for template in templates:
            ids = np.asarray(tokenizer([template(name)], pad=False)[0])
            captions.append(ids)
            class_idx.append(ci)
    lmax = max(c.shape[0] for c in captions)

    chunks = []
    for start in range(0, len(captions), chunk_size):
        cap = captions[start:start + chunk_size]
        idx = class_idx[start:start + chunk_size]
        text = np.full((chunk_size, lmax), pad_id, dtype=np.int32)
        cidx = np.full((chunk_size,), -1, dtype=np.int64)
        for i, c in enumerate(cap):
            text[i, :c.shape[0]] = c
            cidx[i] = idx[i]
        chunks.append((text, text != pad_id, cidx))
    return chunks, len(templates)


def main():
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    parser.add_argument("--model", default="naflexgenlip_b16",
                        help="model config name (a genlip config).")
    parser.add_argument("--checkpoint", default=None,
                        help="Trained weights: native Orbax dir or torch-format file.")
    parser.add_argument("--use-ema", action="store_true")
    parser.add_argument("--imagenet-val", required=True,
                        help="ImageFolder val dir (class subdirs, standard order).")
    parser.add_argument("--seq-len", type=int, default=256,
                        help="NaFlex image patch tokens (eval bucket).")
    parser.add_argument("--patch-size", type=int, default=16)
    parser.add_argument("--templates", choices=("single", "simple", "openai"),
                        default="simple")
    parser.add_argument("--pmi", action="store_true",
                        help="PMI debias: subtract each caption's unconditional "
                             "(null-image) log-likelihood, cancelling string priors.")
    parser.add_argument("--num-images", type=int, default=2000,
                        help="Random subset of val images to evaluate (0 = all).")
    parser.add_argument("--score-batch", type=int, default=256,
                        help="Candidate captions scored per forward (HBM-bound).")
    parser.add_argument("--precision", default="bf16", choices=("fp32", "bf16"))
    parser.add_argument("--platform", default=None, choices=("cpu", "tpu"))
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from open_clip_tpu.factory import create_model, get_tokenizer
    from open_clip_tpu.data.naflex import NaFlexTransform
    from open_clip_tpu.models import genlip as G
    from open_clip_tpu.zero_shot_metadata import (
        IMAGENET_CLASSNAMES,
        OPENAI_IMAGENET_TEMPLATES,
        SIMPLE_IMAGENET_TEMPLATES,
    )
    from PIL import Image

    template_sets = {
        "single": (lambda c: f"a photo of a {c}.",),
        "simple": SIMPLE_IMAGENET_TEMPLATES,
        "openai": OPENAI_IMAGENET_TEMPLATES,
    }

    print(f"Building {args.model} ...")
    model = create_model(args.model, precision=args.precision, load_weights=False)
    if args.checkpoint:
        load_trained_weights(model, args.checkpoint, use_ema=args.use_ema)
    else:
        print("WARNING: no --checkpoint given; running with random weights "
              "(expect ~chance accuracy).")

    tokenizer = get_tokenizer(args.model)
    pad_id = tokenizer.pad_token_id

    classnames = list(IMAGENET_CLASSNAMES)
    templates = template_sets[args.templates]
    print(f"Tokenizing {len(classnames)} classes x {len(templates)} templates ...")
    chunks, n_templates = build_caption_chunks(
        tokenizer, classnames, templates, pad_id, args.score_batch)
    print(f"  {len(classnames) * n_templates} captions -> {len(chunks)} chunk(s)/image "
          f"(score-batch {args.score_batch}, one compiled shape).")

    cfg, params = model.cfg, model.params
    dtype = model.compute_dtype
    cache_fn = jax.jit(functools.partial(G.prefix_cache, params, cfg, compute_dtype=dtype))
    score_fn = jax.jit(functools.partial(G.score_captions, params, cfg, compute_dtype=dtype))

    def class_scores(cache):
        total = np.zeros((len(classnames),), dtype=np.float64)
        for text, valid, cidx in chunks:
            s = np.asarray(score_fn(cache, jnp.asarray(text), jnp.asarray(valid)),
                           dtype=np.float64)
            keep = cidx >= 0
            np.add.at(total, cidx[keep], s[keep])
        return total

    uncond = None
    if args.pmi:
        pdim = args.patch_size * args.patch_size * 3
        null_image = {
            "patches": jnp.zeros((1, args.seq_len, pdim), jnp.float32),
            "patch_coord": jnp.zeros((1, args.seq_len, 2), jnp.int32),
            "patch_valid": jnp.zeros((1, args.seq_len), bool),
        }
        uncond = class_scores(cache_fn(null_image))
        print(f"PMI on: unconditional baseline computed (null image), "
              f"std={uncond.std():.3f}")

    transform = NaFlexTransform(args.seq_len, args.patch_size)
    samples, folder_classes = list_imagefolder(
        args.imagenet_val, args.seed, args.num_images or None)
    if len(folder_classes) != len(classnames):
        raise SystemExit(f"ImageFolder has {len(folder_classes)} classes but "
                         f"{len(classnames)} classnames.")
    print(f"Scoring {len(samples)} images ...")

    top1 = top5 = n = 0
    t0 = time.time()
    for path, label in samples:
        try:
            img = Image.open(path)
        except OSError as exc:
            print(f"  ! skipping {path}: {exc}")
            continue
        d = transform(img)
        cache = cache_fn({k: jnp.asarray(v[None]) for k, v in d.items()})
        scores = class_scores(cache)
        if uncond is not None:
            scores = scores - uncond
        pred5 = np.argsort(scores)[::-1][:5]
        top1 += int(pred5[0] == label)
        top5 += int((pred5 == label).any())
        n += 1
        if n % 100 == 0:
            rate = n / (time.time() - t0)
            print(f"  {n} imgs | top1 {100 * top1 / n:.2f}% top5 {100 * top5 / n:.2f}% "
                  f"| {rate:.1f} img/s")

    print(f"\n=== {args.model} generative zero-shot ({args.templates} templates, "
          f"pmi={args.pmi}, n={n}) ===")
    print(f"  top-1: {100 * top1 / max(n, 1):.2f}%   top-5: {100 * top5 / max(n, 1):.2f}%")


if __name__ == "__main__":
    main()
