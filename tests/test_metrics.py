"""Retrieval metric tests (reference tests/test_retrieval_metrics.py semantics)."""

import numpy as np
import pytest

from open_clip_tpu.train.metrics import get_clip_metrics, paired_retrieval_ranks
from open_clip_tpu.train.zero_shot import accuracy


def test_perfect_retrieval():
    feats = np.eye(8, 16, dtype=np.float32)
    m = get_clip_metrics(feats, feats)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_R@1"] == 1.0
    assert m["image_to_text_mean_rank"] == 1.0


def test_known_ranks():
    # query 0 matches gallery 1 better than gallery 0 -> rank 1 (0-based) for pair 0
    q = np.asarray([[1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    g = np.asarray([[0.5, 0.0], [1.0, 0.0]], dtype=np.float32)
    ranks = paired_retrieval_ranks(q, g)
    assert ranks[0] == 1  # g1 scores higher for q0 than the true g0
    # q1 scores 0 for both gallery rows; the tie at earlier index 0 outranks true idx 1
    assert ranks[1] == 1


def test_tie_break_by_index():
    q = np.asarray([[1.0, 0.0]], dtype=np.float32)
    g = np.asarray([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)  # duplicate gallery rows
    # pair 0: true idx 0, equal logit at idx 1 does NOT outrank (comes later)
    assert paired_retrieval_ranks(q, g)[0] == 0
    g2 = q.repeat(2, 0)
    q2 = np.asarray([[1.0, 0.0], [1.0, 0.0]], dtype=np.float32)
    ranks = paired_retrieval_ranks(q2, g2)
    assert ranks[0] == 0 and ranks[1] == 1  # second duplicate loses the tie


def test_chunking_invariance():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((50, 8)).astype(np.float32)
    g = rng.standard_normal((50, 8)).astype(np.float32)
    r1 = paired_retrieval_ranks(q, g, chunk_size=7)
    r2 = paired_retrieval_ranks(q, g, chunk_size=1000)
    np.testing.assert_array_equal(r1, r2)


def test_accuracy_topk():
    logits = np.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = np.asarray([1, 2])
    top1, top2 = accuracy(logits, labels, topk=(1, 2))
    assert top1 == 1.0  # only first correct
    assert top2 == 1.0  # second sample: top2 = {0,1} no; still only first
