"""Fused/chunked linear + cross-entropy.

Equivalent of reference ``fused_linear_cross_entropy`` (``src/open_clip/loss.py:497-539``,
the Liger-style pure-torch reimplementation): computes CE(hidden @ W.T + b, labels)
without materializing the full (N, V) logit matrix in memory — rows are processed in
chunks under ``jax.checkpoint`` so the backward recomputes each chunk's logits instead
of storing them. On TPU the chunk matmul stays MXU-shaped (chunk x D x V).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def fused_linear_cross_entropy(
    hidden: jax.Array,  # (N, D)
    weight: jax.Array,  # (V, D) — torch Linear layout (lm_head.weight)
    labels: jax.Array,  # (N,) int
    bias: Optional[jax.Array] = None,  # (V,)
    *,
    ignore_index: int = -100,
    chunk_size: int = 4096,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean CE over non-ignored rows, fp32 accumulation, O(chunk x V) live memory."""
    n, d = hidden.shape
    v = weight.shape[0]
    # don't pad tiny inputs up to a full chunk — cap the chunk at n rounded to 128
    chunk_size = min(chunk_size, max(128, (n + 127) // 128 * 128))
    pad = (-n) % chunk_size
    if pad:
        hidden = jnp.concatenate([hidden, jnp.zeros((pad, d), hidden.dtype)], axis=0)
        labels = jnp.concatenate([labels, jnp.full((pad,), ignore_index, labels.dtype)], axis=0)
    num_chunks = hidden.shape[0] // chunk_size
    hc = hidden.reshape(num_chunks, chunk_size, d)
    lc = labels.reshape(num_chunks, chunk_size)

    wT = weight.T  # (D, V)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def chunk_loss(h, l):
        logits = jnp.dot(h, wT.astype(h.dtype)).astype(jnp.float32)
        if bias is not None:
            logits = logits + bias.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe_l = jnp.where(l == ignore_index, 0, l)
        nll = -jnp.take_along_axis(logp, safe_l[:, None], axis=-1)[:, 0]
        if label_smoothing > 0.0:
            smooth = -logp.mean(axis=-1)
            nll = (1 - label_smoothing) * nll + label_smoothing * smooth
        mask = (l != ignore_index).astype(jnp.float32)
        return (nll * mask).sum(), mask.sum()

    def body(carry, inp):
        s, c = carry
        h, l = inp
        ds, dc = chunk_loss(h, l)
        return (s + ds, c + dc), None

    (total, count), _ = lax.scan(body, (jnp.float32(0.0), jnp.float32(0.0)), (hc, lc))
    return total / jnp.maximum(count, 1.0)
