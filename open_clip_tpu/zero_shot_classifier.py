"""Zero-shot classifier construction (reference ``src/open_clip/zero_shot_classifier.py``).

Template-ensemble text classifier built in class batches: for each class, embed all
templated prompts, average, L2-normalize; stack into a (D, num_classes) matrix.
"""

from __future__ import annotations

from functools import partial
from itertools import islice
from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def batched(iterable, n):
    it = iter(iterable)
    while batch := tuple(islice(it, n)):
        yield batch


def build_zero_shot_classifier(
    model,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[Callable, str]],
    num_classes_per_batch: Optional[int] = 10,
    use_tqdm: bool = False,
) -> jax.Array:
    """Batched-by-class classifier build (reference zero_shot_classifier.py:20-75).
    Returns (embed_dim, num_classes)."""
    assert isinstance(templates, Sequence) and len(templates) > 0
    assert isinstance(classnames, Sequence) and len(classnames) > 0
    use_format = isinstance(templates[0], str)
    num_templates = len(templates)

    iter_wrap = _tqdm_wrap(use_tqdm, len(classnames), num_classes_per_batch)

    def _process_batch(batch_classnames):
        num_batch_classes = len(batch_classnames)
        texts = [
            template.format(c=c) if use_format else template(c)
            for c in batch_classnames
            for template in templates
        ]
        tokens = jnp.asarray(tokenizer(texts))
        class_embeddings = model.encode_text(tokens, normalize=True)
        class_embeddings = class_embeddings.reshape(num_batch_classes, num_templates, -1).mean(axis=1)
        norms = jnp.linalg.norm(class_embeddings.astype(jnp.float32), axis=-1, keepdims=True)
        class_embeddings = class_embeddings / norms
        return class_embeddings.T  # (D, num_batch_classes)

    if num_classes_per_batch:
        chunks = [_process_batch(b) for b in iter_wrap(batched(classnames, num_classes_per_batch))]
        return jnp.concatenate(chunks, axis=1)
    return _process_batch(list(classnames))


def build_zero_shot_classifier_legacy(
    model,
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[Callable, str]],
    use_tqdm: bool = False,
) -> jax.Array:
    """Per-class variant (reference zero_shot_classifier.py:76-122)."""
    use_format = isinstance(templates[0], str)
    iter_wrap = _tqdm_wrap(use_tqdm, len(classnames), 1)
    weights = []
    for classname in iter_wrap(classnames):
        texts = [t.format(c=classname) if use_format else t(classname) for t in templates]
        tokens = jnp.asarray(tokenizer(texts))
        emb = model.encode_text(tokens, normalize=True).mean(axis=0)
        emb = emb / jnp.linalg.norm(emb.astype(jnp.float32))
        weights.append(emb)
    return jnp.stack(weights, axis=1)


def _tqdm_wrap(use_tqdm: bool, num_items: int, batch: Optional[int]):
    if not use_tqdm:
        return lambda it: it
    try:
        from tqdm import tqdm

        total = num_items // (batch or 1)
        return partial(tqdm, total=total)
    except ImportError:
        return lambda it: it
