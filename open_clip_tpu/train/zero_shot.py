"""ImageNet zero-shot evaluation (reference ``src/open_clip_train/zero_shot.py``).

Builds the template-ensemble classifier once, then runs batched top-1/top-5 accuracy.
The classifier matmul and accuracy run jitted on device.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..zero_shot_classifier import build_zero_shot_classifier
from ..zero_shot_metadata import IMAGENET_CLASSNAMES, OPENAI_IMAGENET_TEMPLATES

logger = logging.getLogger(__name__)


def accuracy(logits: np.ndarray, labels: np.ndarray, topk=(1,)):
    """top-k accuracy counts (reference zero_shot.py accuracy)."""
    order = np.argsort(-logits, axis=-1)
    out = []
    for k in topk:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out.append(float(hit.sum()))
    return out


def run_zero_shot_classifier(model, classifier, dataloader) -> Dict[str, float]:
    """Per-batch encode_image -> 100 * feat @ classifier -> top1/top5
    (reference zero_shot.py:54-109). Multi-host: the loader is rank-split
    (``make_imagenet_val``), so each process scores only its slice; the top-k
    counts are then summed across processes — every host reports the same
    global accuracy at 1/W of the decode+encode work."""
    from ..parallel.distributed import host_psum

    clf = jnp.asarray(classifier)
    top1 = top5 = n = 0.0
    for batch in dataloader:
        feats = model.encode_image(jnp.asarray(batch["image"]), normalize=True)
        logits = 100.0 * np.asarray(feats, dtype=np.float32) @ np.asarray(clf, dtype=np.float32)
        a1, a5 = accuracy(logits, np.asarray(batch["label"]), topk=(1, 5))
        top1 += a1
        top5 += a5
        n += logits.shape[0]
    top1, top5, n = host_psum([top1, top5, n])
    return {"top1": top1 / max(n, 1), "top5": top5 / max(n, 1)}


def zero_shot_eval(
    model,
    data: Dict[str, Any],
    epoch: int,
    args: Any = None,
    tokenizer=None,
) -> Dict[str, float]:
    """Dispatch over imagenet-val / imagenet-v2 splits (reference zero_shot.py:132-206)."""
    results: Dict[str, float] = {}
    splits = [k for k in ("imagenet-val", "imagenet-v2") if k in data]
    if not splits:
        return results
    get = (lambda k, d=None: getattr(args, k, d)) if args is not None and not isinstance(args, dict) else (args or {}).get
    freq = get("zeroshot_frequency", 1) or 1
    epochs = get("epochs", 1) or 1
    if epoch % freq != 0 and epoch != epochs:
        return results

    logger.info("building zero-shot imagenet classifier")
    if tokenizer is None:
        from ..factory import get_tokenizer

        tokenizer = get_tokenizer(get("model", ""))
    classifier = build_zero_shot_classifier(
        model,
        tokenizer,
        IMAGENET_CLASSNAMES,
        OPENAI_IMAGENET_TEMPLATES,
        num_classes_per_batch=10,
    )
    for split in splits:
        metrics = run_zero_shot_classifier(model, classifier, data[split].dataloader)
        prefix = "imagenet-zeroshot-val-" if split == "imagenet-val" else "imagenetv2-zeroshot-val-"
        results[prefix + "top1"] = metrics["top1"]
        results[prefix + "top5"] = metrics["top5"]
    return results
