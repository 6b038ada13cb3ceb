"""Paired-retrieval metrics (reference ``src/open_clip_train/metrics.py``).

Chunked rank computation with O(chunk x N) memory and tie-break-by-index semantics:
the rank of pair i is the number of logits in row i strictly greater than the true
logit, plus the number of earlier-indexed equal logits (reference
_paired_retrieval_ranks, metrics.py:95-178).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Union

import numpy as np


def _as_matrix(features: Union[np.ndarray, Sequence[np.ndarray]]) -> np.ndarray:
    if isinstance(features, (list, tuple)):
        return np.concatenate([np.asarray(f) for f in features], axis=0)
    return np.asarray(features)


def paired_retrieval_ranks(
    query: np.ndarray,  # (N, D) normalized
    gallery: np.ndarray,  # (N, D) normalized
    logit_scale: float = 1.0,
    chunk_size: int = 1024,
) -> np.ndarray:
    """rank[i] of gallery item i for query i under logits = scale * q @ g.T."""
    q = np.asarray(query, dtype=np.float32)
    g = np.asarray(gallery, dtype=np.float32)
    n = q.shape[0]
    ranks = np.zeros(n, dtype=np.int64)
    gt = g.T
    for start in range(0, n, chunk_size):
        end = min(start + chunk_size, n)
        logits = logit_scale * q[start:end] @ gt  # (c, N)
        idx = np.arange(start, end)
        true = logits[np.arange(end - start), idx]
        greater = (logits > true[:, None]).sum(axis=1)
        # ties broken by index: equal logits at an earlier index outrank
        equal_before = np.zeros(end - start, dtype=np.int64)
        eq = logits == true[:, None]
        for r in range(end - start):
            equal_before[r] = eq[r, : idx[r]].sum()
        ranks[start:end] = greater + equal_before
    return ranks


def get_clip_metrics(
    image_features,
    text_features,
    logit_scale: float = 1.0,
    chunk_size: int = 1024,
) -> Dict[str, float]:
    """R@1/5/10, mean and median rank, both directions (reference metrics.py:179-202)."""
    imf = _as_matrix(image_features)
    txf = _as_matrix(text_features)
    metrics: Dict[str, float] = {}
    for name, q, g in (("image_to_text", imf, txf), ("text_to_image", txf, imf)):
        ranks = paired_retrieval_ranks(q, g, logit_scale, chunk_size)
        metrics[f"{name}_mean_rank"] = float(ranks.mean() + 1)
        metrics[f"{name}_median_rank"] = float(np.floor(np.median(ranks)) + 1)
        for k in (1, 5, 10):
            metrics[f"{name}_R@{k}"] = float((ranks < k).mean())
    return metrics
