"""Audio zero-shot classification eval (reference ``src/open_clip_train/audio_zero_shot.py``).

Template-ensemble text classifier over audio classnames + batched top-1/top-5 over an
audio classification dataset (ESC-50 / UrbanSound8K via HF ``datasets`` when network
allows; any iterable of {"audio": {...}, "label": ...} batches works).
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..zero_shot_classifier import build_zero_shot_classifier
from .zero_shot import accuracy

logger = logging.getLogger(__name__)

ESC50_TEMPLATES = (
    lambda c: f"a sound of {c}.",
    lambda c: f"this is a sound of {c}.",
)


def parse_templates(spec: Optional[str]):
    """``--audio-zeroshot-template`` string -> template callables (reference
    audio_zero_shot.py:365-420 accepts a custom template). ``{}`` marks the
    classname slot; ``|`` separates multiple templates; no ``{}`` means suffix
    form ("a sound of " -> "a sound of {c}")."""
    if not spec:
        return None
    out = []
    for part in spec.split("|"):
        if "{}" in part:
            out.append(lambda c, p=part: p.replace("{}", c))
        else:
            out.append(lambda c, p=part: p + c)
    return tuple(out)


def run_audio_zero_shot(model, classifier, dataloader) -> Dict[str, float]:
    clf = np.asarray(classifier, dtype=np.float32)
    top1 = top5 = n = 0.0
    for batch in dataloader:
        feats = model.encode_audio(batch["audio"], normalize=True)
        logits = 100.0 * np.asarray(feats, dtype=np.float32) @ clf
        a1, a5 = accuracy(logits, np.asarray(batch["label"]), topk=(1, min(5, clf.shape[1])))
        top1 += a1
        top5 += a5
        n += logits.shape[0]
    from ..parallel.distributed import host_psum

    top1, top5, n = host_psum([top1, top5, n])  # rank-split loaders on a pod
    return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}


def audio_zero_shot_eval(
    model,
    data: Dict[str, Any],
    epoch: int,
    args: Any = None,
    tokenizer=None,
    classnames: Optional[Sequence[str]] = None,
    templates: Optional[Sequence[Callable]] = None,
) -> Dict[str, float]:
    """Dispatch over an 'audio-zeroshot' split (reference audio_zero_shot.py:365-420)."""
    results: Dict[str, float] = {}
    if "audio-zeroshot" not in data:
        return results
    get = (lambda k, d=None: getattr(args, k, d)) if args is not None and not isinstance(args, dict) else (args or {}).get
    freq = get("zeroshot_frequency", 1) or 1
    epochs = get("epochs", 1) or 1
    if epoch % freq != 0 and epoch != epochs:
        return results
    split = data["audio-zeroshot"]
    classnames = classnames or getattr(split, "classnames", None)
    if classnames is None:
        logger.warning("audio zero-shot split has no classnames; skipping")
        return results
    templates = templates or ESC50_TEMPLATES
    if tokenizer is None:
        from ..factory import get_tokenizer

        tokenizer = get_tokenizer(getattr(args, "model", "") if args else "")
    classifier = build_zero_shot_classifier(
        model, tokenizer, classnames, templates, num_classes_per_batch=10
    )
    metrics = run_audio_zero_shot(model, classifier, split.dataloader)
    results["audio-zeroshot-top1"] = metrics["top1"]
    results["audio-zeroshot-top5"] = metrics["top5"]
    return results


def _read_wav(path: str):
    """(waveform float32 [-1, 1], sample_rate) from a PCM WAV via stdlib ``wave``
    — no torchaudio/soundfile needed, so the local fixture route runs anywhere
    (8/16/32-bit int and 32-bit float frames; multi-channel is mono-mixed)."""
    import wave

    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        wav = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        # 32-bit WAVs: wave exposes no format code; int32 PCM values are huge,
        # so reinterpret as float32 when that yields in-range audio
        as_f = np.frombuffer(raw, np.float32)
        if np.isfinite(as_f).all() and (np.abs(as_f) <= 4.0).all():
            wav = as_f.astype(np.float32)
        else:
            wav = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        wav = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width} in {path}")
    if nch > 1:
        wav = wav.reshape(-1, nch).mean(axis=1)
    return wav, sr


def build_folder_audio_zero_shot_dataset(
    root: str,
    preprocess,
    batch_size: int = 8,
    world_size: int = 1,
    rank: int = 0,
):
    """Local-files audio classification: ``root/<classname>/*.wav`` -> a loader
    with ``.classnames`` (the offline twin of the HF route below, mirroring
    ``make_imagenet_val``'s ImageFolder layout). Class dirs sort -> label ids;
    underscores in dir names become spaces in classnames. Multi-host: each
    process scores its ``rank::world_size`` stride of the sorted item list and
    ``run_audio_zero_shot`` host-psums the counts."""
    import os

    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    if not classes:
        raise ValueError(f"no class directories under {root}")
    classnames = [c.replace("_", " ") for c in classes]
    items = []
    for li, c in enumerate(classes):
        cdir = os.path.join(root, c)
        for f in sorted(os.listdir(cdir)):
            if f.lower().endswith((".wav", ".wave")):
                items.append((os.path.join(cdir, f), li))
    if not items:
        raise ValueError(f"no .wav files under {root}/<class>/")

    class _Loader:
        classnames = None  # set below

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            auds, labels = [], []
            for path, label in items[rank::world_size]:
                wav, sr = _read_wav(path)
                auds.append(preprocess((wav, sr)))
                labels.append(label)
                if len(auds) == batch_size:
                    yield {
                        "audio": {k: np.stack([a[k] for a in auds]) for k in auds[0]},
                        "label": np.asarray(labels, dtype=np.int32),
                    }
                    auds, labels = [], []
            if auds:
                yield {
                    "audio": {k: np.stack([a[k] for a in auds]) for k in auds[0]},
                    "label": np.asarray(labels, dtype=np.int32),
                }

    loader = _Loader()
    loader.classnames = classnames
    loader.num_samples = len(items)
    return loader


def build_audio_zero_shot_dataset(spec: str, preprocess, **kw):
    """Route ``--audio-zeroshot-dataset``: a local directory (or ``folder:`` prefix)
    uses the offline wav-folder loader; anything else is an HF dataset id."""
    import os

    if spec.startswith("folder:"):
        spec = spec[len("folder:"):]
    if os.path.isdir(spec):
        kw.pop("split", None)
        kw.pop("audio_key", None)
        kw.pop("label_key", None)
        kw.pop("classname_key", None)
        kw.pop("cache_dir", None)
        return build_folder_audio_zero_shot_dataset(spec, preprocess, **kw)
    kw.pop("world_size", None)
    kw.pop("rank", None)
    return build_hf_audio_zero_shot_dataset(spec, preprocess, **kw)


def build_hf_audio_zero_shot_dataset(
    dataset_name: str,
    preprocess,
    batch_size: int = 8,
    split: str = "train",
    audio_key: str = "audio",
    label_key: str = "target",
    classname_key: str = "category",
    cache_dir: Optional[str] = None,
):
    """ESC-50-style HF dataset -> (iterable of batches, classnames)
    (reference build_hf_audio_zero_shot_dataset, audio_zero_shot.py:219-364).
    Requires hub access; raises a clear error offline."""
    import datasets as hfds

    ds = hfds.load_dataset(dataset_name, split=split, cache_dir=cache_dir)
    pairs = sorted({(int(ex[label_key]), str(ex[classname_key]).replace("_", " ")) for ex in ds})
    classnames = [name for _, name in pairs]

    class _Loader:
        def __init__(self):
            self.classnames = classnames

        def set_epoch(self, epoch):
            pass

        def __iter__(self):
            auds, labels = [], []
            for ex in ds:
                wav = np.asarray(ex[audio_key]["array"], dtype=np.float32)
                sr = ex[audio_key]["sampling_rate"]
                auds.append(preprocess((wav, sr)))
                labels.append(int(ex[label_key]))
                if len(auds) == batch_size:
                    yield {
                        "audio": {k: np.stack([a[k] for a in auds]) for k in auds[0]},
                        "label": np.asarray(labels, dtype=np.int32),
                    }
                    auds, labels = [], []
            if auds:
                yield {
                    "audio": {k: np.stack([a[k] for a in auds]) for k in auds[0]},
                    "label": np.asarray(labels, dtype=np.int32),
                }

    loader = _Loader()
    loader.classnames = classnames
    return loader
