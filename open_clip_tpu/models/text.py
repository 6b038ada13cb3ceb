"""Classic CLIP text transformer tower — TPU-native.

Functional re-design of reference ``src/open_clip/transformer.py:1578-1884``
(TextTransformer): causal masking is expressed as a static additive bias folded
with the optional padding/CLS mask; the depth loop is a stacked ``lax.scan``.
Pooling: first / last / argmax (eot = highest token id) / eos / none; optional
appended CLS token (CoCa, ``embed_cls``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CLIPTextCfg
from ..ops.layers import layer_norm, linear
from . import blocks as B

NEG_INF = jnp.finfo(jnp.float32).min


def init_text_tower(key, cfg: CLIPTextCfg, embed_dim: int) -> Dict[str, Any]:
    width = cfg.width
    num_pos = cfg.context_length + (1 if cfg.embed_cls else 0)
    ks = jax.random.split(key, 8)
    p: Dict[str, Any] = {
        # init stds match reference TextTransformer.init_parameters (transformer.py:1666-1680)
        "token_embedding": B.normal_init(ks[0], (cfg.vocab_size, width), 0.02),
        "positional_embedding": B.normal_init(ks[1], (num_pos, width), 0.01),
    }
    if cfg.embed_cls:
        p["cls_emb"] = B.normal_init(ks[2], (width,), 0.01)
    p["blocks"] = B.init_block_stack(
        ks[3], cfg.layers, width, cfg.heads, int(width * cfg.mlp_ratio),
        ls_init_value=cfg.ls_init_value, init_scheme="text",
        qk_norm=cfg.qk_norm, scaled_cosine=cfg.scaled_cosine_attn,
        scale_heads=cfg.scale_heads,
        scale_attn_inner=cfg.scale_attn_inner, scale_attn=cfg.scale_attn,
        scale_fc=cfg.scale_fc,
    )
    p["ln_final"] = B._ln_params(width)
    if cfg.proj_type != "none" and embed_dim:
        if cfg.proj_bias:
            p["text_projection"] = {
                "kernel": B.normal_init(ks[4], (width, embed_dim), width ** -0.5),
                "bias": jnp.zeros((embed_dim,)),
            }
        else:
            p["text_projection"] = B.normal_init(ks[4], (width, embed_dim), width ** -0.5)
    return p


def _build_bias(
    cfg: CLIPTextCfg,
    text: jax.Array,  # (B, L) original ids, before CLS append
    seq_len: int,
) -> Tuple[Optional[jax.Array], bool]:
    """-> (additive attention bias (B, 1, S, S) or None, causal flag), folding the
    padding/CLS key mask (reference _build_additive_mask, transformer.py:1731-1752).

    When the mask is causal-ONLY (plain CLIP text towers), no bias tensor is built:
    the causal flag is returned instead so attention dispatch can pick the fused
    short-sequence Pallas kernel, which applies causality in-kernel — measured
    ~0.5 ms/layer faster than the dense-XLA additive-bias path at (256, 77, 8, 64)
    fwd+bwd on v5e. A bias tensor is only materialized when a per-sample key mask
    (CoCa's pad/CLS mask) must be folded in."""
    need_pad_mask = cfg.embed_cls  # use_pad_mask only applies in bi-dir mode in reference
    causal = not cfg.no_causal_mask

    if causal and not need_pad_mask:
        return None, True

    bias = None
    if causal:
        causal_bias = jnp.where(
            jnp.tril(jnp.ones((seq_len, seq_len), dtype=bool)), 0.0, NEG_INF
        ).astype(jnp.float32)
        bias = causal_bias[None, None]

    if need_pad_mask:
        valid = text != cfg.pad_id  # (B, L)
        if cfg.embed_cls:
            cls_valid = jnp.ones((valid.shape[0], 1), dtype=bool)
            # reference legacy CoCa mask places cls validity first (correct_cls_mask=False default)
            valid = jnp.concatenate([cls_valid, valid], axis=1)
        key_bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)  # (B, S)
        key_bias = key_bias[:, None, None, :]  # (B, 1, 1, S) broadcast over queries
        bias = key_bias if bias is None else bias + key_bias
    return bias, False


def text_global_pool(
    x: jax.Array,
    text: Optional[jax.Array] = None,
    pool_type: str = "argmax",
    eos_token_id: Optional[int] = None,
) -> jax.Array:
    """Pool token features (reference text_global_pool, transformer.py:931-955)."""
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    if pool_type == "argmax":
        idx = jnp.argmax(text, axis=-1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    if pool_type == "eos":
        idx = jnp.argmax((text == eos_token_id).astype(jnp.int32), axis=-1)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    return x  # 'none'


def apply_text_tower(
    params: Dict[str, Any],
    cfg: CLIPTextCfg,
    text: jax.Array,  # (B, L) int token ids
    *,
    compute_dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
    act: str = "gelu",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pooled (B, embed_dim), tokens (B, L, width))."""
    eps = cfg.ln_eps
    b, seq_len = text.shape

    x = params["token_embedding"][text].astype(compute_dtype)
    if cfg.embed_cls:
        cls = jnp.broadcast_to(
            params["cls_emb"].astype(compute_dtype)[None, None, :], (b, 1, x.shape[-1])
        )
        x = jnp.concatenate([x, cls], axis=1)  # CLS appended at the end (CoCa)
        seq_len += 1

    bias, causal = _build_bias(cfg, text, seq_len)
    x = x + params["positional_embedding"][:seq_len].astype(compute_dtype)

    x = B.apply_transformer(
        params["blocks"], x, heads=cfg.heads, act=act, bias=bias, causal=causal,
        norm_eps=eps, remat=remat, attn_impl=attn_impl,
    )

    ln_final = lambda y: layer_norm(y, params["ln_final"]["scale"], params["ln_final"]["bias"], eps=eps)
    if cfg.embed_cls:
        # appended CLS overrides pool_type: take last token, then LN (transformer.py:1857-1862)
        pooled = ln_final(text_global_pool(x, pool_type="last"))
        tokens = x[:, :-1]
    else:
        x = ln_final(x)
        pooled = text_global_pool(x, text, pool_type=cfg.pool_type, eos_token_id=cfg.eos_id)
        tokens = x

    tp = params.get("text_projection")
    if tp is not None:
        if isinstance(tp, dict):
            pooled = linear(pooled, tp["kernel"], tp.get("bias"))
        else:
            pooled = jnp.dot(pooled, tp.astype(pooled.dtype))
    return pooled, tokens
