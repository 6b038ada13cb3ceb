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
