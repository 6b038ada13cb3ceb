"""Flash attention for TPU (Pallas).

Placeholder dispatch target: currently routes to the fp32-softmax einsum formulation
(XLA already fuses this well at CLIP-scale sequence lengths); the tiled Pallas kernel
for long-sequence models (NaFlex/GenLIP) replaces this body.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def flash_attention(
    q: jax.Array,  # (B, L, H, hd)
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
) -> jax.Array:
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool), k=lk - lq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
