"""Multi-head attention for TPU.

The reference routes attention through ``F.scaled_dot_product_attention``
(reference ``src/open_clip/transformer.py:223``). Here the core is an einsum
formulation with fp32 softmax that XLA maps straight onto the MXU, plus a
dispatch hook to the Pallas flash-attention kernel (``ops/flash_attention.py``)
for long sequences on real TPUs.

Layout convention: activations are (B, L, D); heads are split as (B, L, H, hd)
and contracted with einsum — no explicit transposes materialize on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp

from .layers import layer_norm

# sequence length at/above which the Pallas flash kernel is preferred on TPU
_FLASH_MIN_SEQ = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def dot_product_attention(
    q: jax.Array,  # (B, Lq, H, hd)
    k: jax.Array,  # (B, Lk, H, hd)
    v: jax.Array,  # (B, Lk, H, hd)
    bias: Optional[jax.Array] = None,  # additive, broadcastable to (B, H, Lq, Lk)
    causal: bool = False,
    scale: Optional[float] = None,
    impl: str = "auto",
    key_valid: Optional[jax.Array] = None,  # (B, Lk) key-padding mask (NaFlex)
) -> jax.Array:
    """Scaled dot-product attention with fp32 softmax. Returns (B, Lq, H, hd)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5

    if impl == "auto":
        if _on_tpu() and q.shape[1] == k.shape[1]:
            from .short_attention import supports as _short_ok

            if bias is None and key_valid is not None                     and q.shape[1] >= _FLASH_MIN_SEQ and q.shape[-1] % 64 == 0:
                impl = "flash"  # key-padding handled in-kernel
            elif key_valid is None and _short_ok(q.shape[1], q.shape[2], q.shape[-1], bias):
                impl = "short"
            elif bias is None and key_valid is None                     and q.shape[1] >= _FLASH_MIN_SEQ and q.shape[-1] % 64 == 0:
                impl = "flash"
            else:
                impl = "xla"
        else:
            impl = "xla"

    if impl == "short":
        from .short_attention import short_attention

        return short_attention(q, k, v, causal=causal, scale=scale)

    if impl == "flash":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, causal=causal, scale=scale, key_valid=key_valid)

    if key_valid is not None:
        kv_bias = jnp.where(key_valid.astype(bool), 0.0, jnp.finfo(jnp.float32).min * 0.5)
        kv_bias = kv_bias.astype(jnp.float32)[:, None, None, :]
        bias = kv_bias if bias is None else bias + kv_bias

    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if causal:
        lq, lk = q.shape[1], k.shape[1]
        mask = jnp.tril(jnp.ones((lq, lk), dtype=bool), k=lk - lq)
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


_LOGIT_SCALE_MAX = math.log(1.0 / 0.01)


def multi_head_attention(
    params: dict,
    x: jax.Array,  # (B, Lq, D)
    kv: Optional[jax.Array] = None,  # (B, Lk, Dk) for cross-attention
    *,
    num_heads: int,
    bias: Optional[jax.Array] = None,
    causal: bool = False,
    qk_norm_eps: Optional[float] = None,
    impl: str = "auto",
    key_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Standard MHA matching reference ``Attention`` (transformer.py:61-249) semantics.

    params:
      either fused {'qkv': {'kernel': (D, 3D), 'bias': (3D,)?}} for self-attention
      or separate {'q': {...}, 'k': {...}, 'v': {...}} (cross-attention / kdim != dim),
      plus {'out': {'kernel': (D, D), 'bias': (D,)}},
      optional {'ln_q': {scale, bias}, 'ln_k': {scale, bias}} for qk-norm (per-head-dim LN).
    """
    b, lq, d = x.shape
    hd = d // num_heads

    if kv is None and "qkv" in params:
        from jax.ad_checkpoint import checkpoint_name

        qkv = jnp.dot(x, params["qkv"]["kernel"].astype(x.dtype))
        if params["qkv"].get("bias") is not None:
            qkv = qkv + params["qkv"]["bias"].astype(qkv.dtype)
        # under the "names_mm" remat preset the fused projection is SAVED, so the
        # backward reads it instead of recomputing the (D, 3D) matmul per layer
        qkv = checkpoint_name(qkv, "remat_qkv")
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        kv = x if kv is None else kv
        if "qkv" in params:
            wq, wk, wv = jnp.split(params["qkv"]["kernel"], 3, axis=-1)
            bq = bk = bv = None
            if params["qkv"].get("bias") is not None:
                bq, bk, bv = jnp.split(params["qkv"]["bias"], 3)
            pq = {"kernel": wq, "bias": bq}
            pk = {"kernel": wk, "bias": bk}
            pv = {"kernel": wv, "bias": bv}
        else:
            pq, pk, pv = params["q"], params["k"], params["v"]
        q = _proj(x, pq)
        k = _proj(kv, pk)
        v = _proj(kv, pv)

    lk = k.shape[1]
    q = q.reshape(b, lq, num_heads, hd)
    k = k.reshape(b, lk, num_heads, hd)
    v = v.reshape(b, lk, num_heads, hd)

    if qk_norm_eps is not None and "ln_q" in params:
        q = layer_norm(q, params["ln_q"]["scale"], params["ln_q"]["bias"], eps=qk_norm_eps)
        k = layer_norm(k, params["ln_k"]["scale"], params["ln_k"]["bias"], eps=qk_norm_eps)

    if "logit_scale" in params:
        # scaled-cosine attention (reference transformer.py:120-121, 207-218):
        # cosine-normalized q/k, learned per-head logit scale clamped at log(1/0.01).
        # Folding exp(scale) * sqrt(hd) into q cancels the 1/sqrt(hd) applied inside
        # dot_product_attention, so one attention code path serves both.
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q32 = q32 / jnp.maximum(jnp.linalg.norm(q32, axis=-1, keepdims=True), 1e-12)
        k32 = k32 / jnp.maximum(jnp.linalg.norm(k32, axis=-1, keepdims=True), 1e-12)
        ls = jnp.exp(jnp.minimum(params["logit_scale"].reshape(-1).astype(jnp.float32),
                                 _LOGIT_SCALE_MAX))
        q32 = q32 * (ls[None, None, :, None] * (hd ** 0.5))
        q = q32.astype(q.dtype)
        k = k32.astype(k.dtype)

    out = dot_product_attention(q, k, v, bias=bias, causal=causal, impl=impl,
                                key_valid=key_valid)

    if "head_scale" in params:  # NormFormer per-head scale, (H,)
        out = out * params["head_scale"].astype(out.dtype)[None, None, :, None]

    out = out.reshape(b, lq, d)
    if "ln_inner" in params:  # Sub-LN: normalize the attention context BEFORE out-proj
        out = layer_norm(out, params["ln_inner"]["scale"], params["ln_inner"]["bias"],
                         eps=qk_norm_eps or 1e-5)
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "remat_attn_ctx")
    out = jnp.dot(out, params["out"]["kernel"].astype(out.dtype))
    if params["out"].get("bias") is not None:
        out = out + params["out"]["bias"].astype(out.dtype)
    return out


def _proj(x, p):
    y = jnp.dot(x, p["kernel"].astype(x.dtype))
    if p.get("bias") is not None:
        y = y + p["bias"].astype(y.dtype)
    return y
