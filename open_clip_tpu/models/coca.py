"""CoCa: contrastive captioner — TPU-native.

Functional re-design of reference ``src/open_clip/coca_model.py`` +
``MultimodalTransformer`` (``src/open_clip/transformer.py:1887-1998``): the vision tower
uses an attentional pooler with ``output_tokens`` (first latent = contrastive token,
rest = decoder memory); the text tower appends a CLS token (``embed_cls``); the decoder
interleaves causal self-attention blocks with cross-attention blocks over the image
latents, both stacked and scanned together.

Generation runs as a single jitted ``lax.fori_loop`` with a fixed sequence buffer
(static XLA shapes; one compile for the whole decode) supporting greedy / top-k /
top-p sampling — unlike the reference, which loops in python through HF
GenerationMixin with the KV cache forced off (coca_model.py:353-356).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPModelCfg, MultimodalCfg
from ..ops.layers import layer_norm
from . import blocks as B
from . import text as text_mod
from . import vit


# ---------------------------------------------------------------------------
# multimodal decoder
# ---------------------------------------------------------------------------

def init_multimodal_decoder(key, cfg: MultimodalCfg, output_dim: int) -> Dict[str, Any]:
    """output_dim is the vocab size (reference builds the decoder with
    ``_build_text_decoder_tower(vocab_size, ...)``, coca_model.py:97-101)."""
    width, heads = cfg.width, cfg.heads
    ks = jax.random.split(key, 4)
    p: Dict[str, Any] = {
        "blocks": B.init_block_stack(
            ks[0], cfg.layers, width, heads, int(width * cfg.mlp_ratio),
            ls_init_value=cfg.ls_init_value, init_scheme="text",
        ),
        "cross_blocks": _init_cross_stack(ks[1], cfg),
        "ln_final": B._ln_params(width),
        "text_projection": B.normal_init(ks[2], (width, output_dim), width ** -0.5),
    }
    return p


def _init_cross_block(key, cfg: MultimodalCfg):
    width, heads = cfg.width, cfg.heads
    p = B.init_block(
        key, width, heads, int(width * cfg.mlp_ratio),
        ls_init_value=cfg.ls_init_value, init_scheme="text", depth_for_init=cfg.layers,
    )
    p["ln_1_kv"] = B._ln_params(width)
    return p


def _init_cross_stack(key, cfg: MultimodalCfg):
    keys = jax.random.split(key, cfg.layers)
    return jax.vmap(lambda k: _init_cross_block(k, cfg))(keys)


def apply_multimodal_decoder(
    params: Dict[str, Any],
    cfg: MultimodalCfg,
    image_embs: jax.Array,  # (B, M, W)
    text_embs: jax.Array,  # (B, L, W)
    *,
    act: str = "gelu",
    remat: bool = False,
    return_hidden: bool = False,
) -> jax.Array:
    """(B, L, vocab) logits — reference MultimodalTransformer.forward (transformer.py:1963-1986).

    ``return_hidden=True`` returns the post-ln_final hidden states WITHOUT the vocab
    projection so the training loss can run the projection fused with the CE
    (``ops/fused_ce.py``) — the full (B, L, V) logit tensor never materializes."""
    from ..ops.attention import multi_head_attention

    eps = cfg.ln_eps
    heads = cfg.heads

    def body(x, p):
        ps, pc = p
        x = B.apply_block(ps, x, heads=heads, act=act, causal=True, norm_eps=eps)
        # cross-attention block: q from ln_1(x); k/v from ln_1_kv(image_embs)
        kv = layer_norm(image_embs, pc["ln_1_kv"]["scale"], pc["ln_1_kv"]["bias"], eps=eps)
        h = layer_norm(x, pc["ln_1"]["scale"], pc["ln_1"]["bias"], eps=eps)
        h = multi_head_attention(pc["attn"], h, kv=kv, num_heads=heads)
        if "ls_1" in pc:
            h = h * pc["ls_1"].astype(h.dtype)
        x = x + h
        h = layer_norm(x, pc["ln_2"]["scale"], pc["ln_2"]["bias"], eps=eps)
        from ..ops.layers import ACT_FNS, linear

        h = linear(h, pc["mlp"]["c_fc"]["kernel"], pc["mlp"]["c_fc"].get("bias"))
        h = ACT_FNS[act](h)
        h = linear(h, pc["mlp"]["c_proj"]["kernel"], pc["mlp"]["c_proj"].get("bias"))
        if "ls_2" in pc:
            h = h * pc["ls_2"].astype(h.dtype)
        x = x + h
        return x, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, text_embs, (params["blocks"], params["cross_blocks"]), unroll=B.scan_unroll())

    x = layer_norm(x, params["ln_final"]["scale"], params["ln_final"]["bias"], eps=eps)
    if return_hidden:
        return x
    return jnp.dot(x, params["text_projection"].astype(x.dtype))


# ---------------------------------------------------------------------------
# CoCa forward
# ---------------------------------------------------------------------------

def coca_forward(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: Optional[jax.Array] = None,
    text: Optional[jax.Array] = None,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    return_hidden: bool = False,
) -> Dict[str, jax.Array]:
    """reference CoCa.forward (coca_model.py:218-246).

    ``return_hidden=True`` emits ``out["hidden"]`` (pre-projection decoder states)
    instead of ``out["logits"]`` for the fused-CE training path."""
    from .clip import _l2_normalize

    act = "quick_gelu" if cfg.quick_gelu else "gelu"
    out: Dict[str, jax.Array] = {}
    image_embs = None
    if image is not None:
        pooled, image_embs = vit.apply_vision_tower(
            params["visual"], cfg.vision_cfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat, act=act,
        )
        out["image_features"] = _l2_normalize(pooled)
    if text is not None:
        t_pooled, token_embs = text_mod.apply_text_tower(
            params["text"], cfg.text_cfg, text, compute_dtype=compute_dtype, remat=remat, act=act,
        )
        out["text_features"] = _l2_normalize(t_pooled)
        if image_embs is not None:
            dec = apply_multimodal_decoder(
                params["text_decoder"], cfg.multimodal_cfg, image_embs, token_embs,
                act=act, remat=remat, return_hidden=return_hidden,
            )
            out["hidden" if return_hidden else "logits"] = dec
            out["labels"] = text  # AR shift handled by the loss/task (reference coca_task.py:45-53)
    out["logit_scale"] = jnp.exp(params["logit_scale"].astype(jnp.float32))
    if "logit_bias" in params:
        out["logit_bias"] = params["logit_bias"].astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def _qkv_single(p, h, heads, eps):
    """q, k, v (B, 1, H, hd) from a single-position hidden (B, 1, W), fused or split
    projections + optional qk-norm — the decode-path twin of ops.attention's
    projection block, including the CustomResidualAttentionBlock variants
    (scaled-cosine logit_scale below; head_scale / Sub-LN live in the cached
    block apply)."""
    b, _, d = h.shape
    hd = d // heads
    if "qkv" in p:
        qkv = jnp.dot(h, p["qkv"]["kernel"].astype(h.dtype))
        if p["qkv"].get("bias") is not None:
            qkv = qkv + p["qkv"]["bias"].astype(qkv.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        from ..ops.attention import _proj

        q, k, v = _proj(h, p["q"]), _proj(h, p["k"]), _proj(h, p["v"])
    q = q.reshape(b, 1, heads, hd)
    k = k.reshape(b, 1, heads, hd)
    v = v.reshape(b, 1, heads, hd)
    if "ln_q" in p:
        q = layer_norm(q, p["ln_q"]["scale"], p["ln_q"]["bias"], eps=eps)
        k = layer_norm(k, p["ln_k"]["scale"], p["ln_k"]["bias"], eps=eps)
    if "logit_scale" in p:
        # scaled-cosine attention (ops/attention.py:148-161): per-position cosine
        # normalization composes with the cache because it depends only on the
        # position's own vector — cached K rows are stored normalized, and the
        # clamped per-head scale folds into q against the 1/sqrt(hd) in
        # _attend_cached exactly as in the batch path.
        import math as _math

        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q32 = q32 / jnp.maximum(jnp.linalg.norm(q32, axis=-1, keepdims=True), 1e-12)
        k32 = k32 / jnp.maximum(jnp.linalg.norm(k32, axis=-1, keepdims=True), 1e-12)
        ls = jnp.exp(jnp.minimum(p["logit_scale"].reshape(-1).astype(jnp.float32),
                                 _math.log(1.0 / 0.01)))
        q32 = q32 * (ls[None, None, :, None] * (hd ** 0.5))
        q = q32.astype(q.dtype)
        k = k32.astype(k.dtype)
    return q, k, v


def _attend_cached(q, k_cache, v_cache, k_own, v_own, t_i):
    """Single-query attention over [cache slots < t_i-1 ; own]; fp32 softmax."""
    b, _, heads, hd = q.shape
    L = k_cache.shape[1]
    k = jnp.concatenate([k_cache, k_own], axis=1)  # (B, L+1, H, hd)
    v = jnp.concatenate([v_cache, v_own], axis=1)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) / np.sqrt(hd)
    ok = jnp.concatenate([jnp.arange(L) < (t_i - 1), jnp.ones((1,), bool)])
    scores = jnp.where(ok[None, None, None, :], scores, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32))
    return out.reshape(b, 1, heads * hd).astype(q.dtype)


def _cached_self_block(p, x, k_cache, v_cache, t_i, *, heads, act, eps):
    """One standard block (models/blocks.apply_block) on a single decode position with
    a K/V cache; returns (x, k_own, v_own) — caller writes own K/V into the buffer."""
    from ..ops.layers import ACT_FNS, linear

    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"], eps=eps)
    q, k_own, v_own = _qkv_single(p["attn"], h, heads, eps)
    out = _attend_cached(q, k_cache, v_cache, k_own, v_own, t_i)
    if "head_scale" in p["attn"]:  # NormFormer per-head scale (attention.py:166-167)
        b_, _, w_ = out.shape
        out = (out.reshape(b_, 1, heads, w_ // heads)
               * p["attn"]["head_scale"].astype(out.dtype)[None, None, :, None]
               ).reshape(b_, 1, w_)
    if "ln_inner" in p["attn"]:  # Sub-LN before the out-proj (attention.py:170-172)
        out = layer_norm(out, p["attn"]["ln_inner"]["scale"],
                         p["attn"]["ln_inner"]["bias"], eps=eps)
    out = jnp.dot(out, p["attn"]["out"]["kernel"].astype(out.dtype))
    if p["attn"]["out"].get("bias") is not None:
        out = out + p["attn"]["out"]["bias"].astype(out.dtype)
    if "ls_1" in p:
        out = out * p["ls_1"].astype(out.dtype)
    x = x + out
    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"], eps=eps)
    h = linear(h, p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"].get("bias"))
    h = ACT_FNS[act](h)
    h = linear(h, p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"].get("bias"))
    if "ls_2" in p:
        h = h * p["ls_2"].astype(h.dtype)
    return x + h, k_own, v_own


def _cross_block_cached(pc, x, k_img, v_img, *, heads, act, eps):
    """Cross-attention block against precomputed image K/V (B, M, H, hd)."""
    from ..ops.layers import ACT_FNS, linear

    b, _, d = x.shape
    hd = d // heads
    h = layer_norm(x, pc["ln_1"]["scale"], pc["ln_1"]["bias"], eps=eps)
    if "qkv" in pc["attn"]:
        wq = pc["attn"]["qkv"]["kernel"][:, :d]
        bq = None if pc["attn"]["qkv"].get("bias") is None else pc["attn"]["qkv"]["bias"][:d]
    else:
        wq = pc["attn"]["q"]["kernel"]
        bq = pc["attn"]["q"].get("bias")
    q = jnp.dot(h, wq.astype(h.dtype))
    if bq is not None:
        q = q + bq.astype(q.dtype)
    q = q.reshape(b, 1, heads, hd)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k_img.astype(jnp.float32)) / np.sqrt(hd)
    w = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, v_img.astype(jnp.float32))
    out = out.reshape(b, 1, d).astype(x.dtype)
    out = jnp.dot(out, pc["attn"]["out"]["kernel"].astype(out.dtype))
    if pc["attn"]["out"].get("bias") is not None:
        out = out + pc["attn"]["out"]["bias"].astype(out.dtype)
    if "ls_1" in pc:
        out = out * pc["ls_1"].astype(out.dtype)
    x = x + out
    h = layer_norm(x, pc["ln_2"]["scale"], pc["ln_2"]["bias"], eps=eps)
    h = linear(h, pc["mlp"]["c_fc"]["kernel"], pc["mlp"]["c_fc"].get("bias"))
    h = ACT_FNS[act](h)
    h = linear(h, pc["mlp"]["c_proj"]["kernel"], pc["mlp"]["c_proj"].get("bias"))
    if "ls_2" in pc:
        h = h * pc["ls_2"].astype(h.dtype)
    return x + h


def _cross_kv_all_layers(params, cfg: CLIPModelCfg, image_embs: jax.Array):
    """Cross-attention K/V from ln_1_kv(image_embs) for every decoder layer, computed
    once per image: each (depth, N, M, H, hd)."""
    mcfg = cfg.multimodal_cfg
    m_width, m_heads = mcfg.width, mcfg.heads
    m_hd = m_width // m_heads
    n, m = image_embs.shape[:2]

    def one(pc):
        kv = layer_norm(image_embs, pc["ln_1_kv"]["scale"], pc["ln_1_kv"]["bias"],
                        eps=mcfg.ln_eps)
        if "qkv" in pc["attn"]:
            wk = pc["attn"]["qkv"]["kernel"][:, m_width:2 * m_width]
            wv = pc["attn"]["qkv"]["kernel"][:, 2 * m_width:]
            bk = bv = None
            if pc["attn"]["qkv"].get("bias") is not None:
                bk = pc["attn"]["qkv"]["bias"][m_width:2 * m_width]
                bv = pc["attn"]["qkv"]["bias"][2 * m_width:]
        else:
            wk, bk = pc["attn"]["k"]["kernel"], pc["attn"]["k"].get("bias")
            wv, bv = pc["attn"]["v"]["kernel"], pc["attn"]["v"].get("bias")
        k = jnp.dot(kv, wk.astype(kv.dtype))
        v = jnp.dot(kv, wv.astype(kv.dtype))
        if bk is not None:
            k = k + bk.astype(k.dtype)
            v = v + bv.astype(v.dtype)
        return (k.reshape(n, m, m_heads, m_hd), v.reshape(n, m, m_heads, m_hd))

    return jax.vmap(one)(params["text_decoder"]["cross_blocks"])


def _cached_decode_logits(params, cfg: CLIPModelCfg, tok, t, tk, tv, dk, dv,
                          k_img, v_img, *, act, compute_dtype):
    """One decode position (token ids ``tok`` (N, 1) at position t-1) through the text
    tower and decoder with K/V caches; returns (logits (N, V) fp32, updated caches)."""
    tcfg, mcfg = cfg.text_cfg, cfg.multimodal_cfg
    t_eps, m_eps = tcfg.ln_eps, mcfg.ln_eps
    t_heads, m_heads = tcfg.heads, mcfg.heads

    x = params["text"]["token_embedding"][tok[:, 0]].astype(compute_dtype)[:, None]
    pos = jax.lax.dynamic_slice(
        params["text"]["positional_embedding"], (t - 1, 0), (1, tcfg.width))
    x = x + pos.astype(compute_dtype)[None]

    def text_body(carry_x, inp):
        p, kc, vc = inp
        out, k_own, v_own = _cached_self_block(
            p, carry_x, kc, vc, t, heads=t_heads, act=act, eps=t_eps)
        return out, (k_own.astype(compute_dtype), v_own.astype(compute_dtype))

    x, (tk_new, tv_new) = jax.lax.scan(
        text_body, x, (params["text"]["blocks"], tk, tv), unroll=B.scan_unroll())
    tk = jax.lax.dynamic_update_slice(tk, tk_new, (0, 0, t - 1, 0, 0))
    tv = jax.lax.dynamic_update_slice(tv, tv_new, (0, 0, t - 1, 0, 0))
    # token memory for the decoder is the pre-ln_final block output
    # (apply_text_tower embed_cls path returns tokens = x[:, :-1])

    def dec_body(carry_x, inp):
        ps, pc, kc, vc, kc_img, vc_img = inp
        out, k_own, v_own = _cached_self_block(
            ps, carry_x, kc, vc, t, heads=m_heads, act=act, eps=m_eps)
        out = _cross_block_cached(pc, out, kc_img, vc_img, heads=m_heads,
                                  act=act, eps=m_eps)
        return out, (k_own.astype(compute_dtype), v_own.astype(compute_dtype))

    x, (dk_new, dv_new) = jax.lax.scan(
        dec_body, x,
        (params["text_decoder"]["blocks"], params["text_decoder"]["cross_blocks"],
         dk, dv, k_img, v_img),
        unroll=B.scan_unroll())
    dk = jax.lax.dynamic_update_slice(dk, dk_new, (0, 0, t - 1, 0, 0))
    dv = jax.lax.dynamic_update_slice(dv, dv_new, (0, 0, t - 1, 0, 0))

    h = layer_norm(x, params["text_decoder"]["ln_final"]["scale"],
                   params["text_decoder"]["ln_final"]["bias"], eps=m_eps)
    step_logits = jnp.dot(
        h[:, 0], params["text_decoder"]["text_projection"].astype(h.dtype)
    ).astype(jnp.float32)
    return step_logits, tk, tv, dk, dv


def generate_cached(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: jax.Array,
    rng: Optional[jax.Array] = None,
    *,
    seq_len: int = 30,
    min_seq_len: int = 5,
    generation_type: str = "greedy",
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.1,
    repetition_penalty: float = 1.0,
    sot_token_id: int = 49406,
    eos_token_id: int = 49407,
    pad_token_id: int = 0,
    compute_dtype=jnp.float32,
) -> jax.Array:
    """KV-cached incremental CoCa decode (the reference forces the HF cache OFF,
    coca_model.py:353-356, re-encoding the full prefix each step — as does our
    uncached loop). Per step this processes ONE text position through the text tower
    and decoder against cached self-attention K/V plus once-precomputed cross-attention
    image K/V: O(T·(M+T)·D) attention instead of O(T·(M+T)²·D). Token-for-token equal
    to ``generate`` (tested). Exactness: the text tower is causal and the appended CLS
    sits after every token, so per-position hiddens never depend on later positions."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b = image.shape[0]
    act = "quick_gelu" if cfg.quick_gelu else "gelu"
    tcfg = cfg.text_cfg
    mcfg = cfg.multimodal_cfg
    t_heads, m_heads = tcfg.heads, mcfg.heads
    t_hd, m_hd = tcfg.width // t_heads, mcfg.width // m_heads

    _, image_embs = vit.apply_vision_tower(
        params["visual"], cfg.vision_cfg, image, compute_dtype=compute_dtype, act=act,
    )
    k_img, v_img = _cross_kv_all_layers(params, cfg, image_embs)

    ids0 = jnp.full((b, seq_len), pad_token_id, dtype=jnp.int32).at[:, 0].set(sot_token_id)
    done0 = jnp.zeros((b,), dtype=bool)
    n_text = tcfg.layers
    n_dec = mcfg.layers
    tk0 = jnp.zeros((n_text, b, seq_len, t_heads, t_hd), dtype=compute_dtype)
    tv0 = jnp.zeros_like(tk0)
    dk0 = jnp.zeros((n_dec, b, seq_len, m_heads, m_hd), dtype=compute_dtype)
    dv0 = jnp.zeros_like(dk0)

    def step(t, carry):
        ids, done, key, tk, tv, dk, dv = carry
        tok = jax.lax.dynamic_slice(ids, (0, t - 1), (b, 1))
        step_logits, tk, tv, dk, dv = _cached_decode_logits(
            params, cfg, tok, t, tk, tv, dk, dv, k_img, v_img,
            act=act, compute_dtype=compute_dtype)

        if repetition_penalty != 1.0:
            seen = jax.nn.one_hot(ids, step_logits.shape[-1], dtype=bool)
            seen = seen & (jnp.arange(seq_len) < t)[None, :, None]
            seen = seen.any(axis=1)
            penal = jnp.where(step_logits > 0, step_logits / repetition_penalty,
                              step_logits * repetition_penalty)
            step_logits = jnp.where(seen, penal, step_logits)

        neg = jnp.finfo(jnp.float32).min
        step_logits = jnp.where(
            (t < min_seq_len) & (jnp.arange(step_logits.shape[-1]) == eos_token_id)[None, :],
            neg, step_logits,
        )

        if generation_type == "greedy":
            nxt = jnp.argmax(step_logits, axis=-1)
        else:
            step_logits = step_logits / max(temperature, 1e-6)
            if generation_type == "top_k":
                kth = jax.lax.top_k(step_logits, max(top_k, 1))[0][:, -1:]
                step_logits = jnp.where(step_logits < kth, neg, step_logits)
            elif generation_type == "top_p":
                sorted_logits = jnp.sort(step_logits, axis=-1)[:, ::-1]
                probs = jax.nn.softmax(sorted_logits, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
                cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
                step_logits = jnp.where(step_logits < cutoff, neg, step_logits)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, step_logits, axis=-1)

        nxt = jnp.where(done, pad_token_id, nxt).astype(jnp.int32)
        ids = jax.lax.dynamic_update_slice(ids, nxt[:, None], (0, t))
        done = done | (nxt == eos_token_id)
        return ids, done, key, tk, tv, dk, dv

    ids, _, _, _, _, _, _ = jax.lax.fori_loop(
        1, seq_len, step, (ids0, done0, rng, tk0, tv0, dk0, dv0))
    return ids


def generate(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: jax.Array,
    rng: Optional[jax.Array] = None,
    *,
    seq_len: int = 30,
    min_seq_len: int = 5,
    generation_type: str = "greedy",  # greedy | top_k | top_p
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.1,
    repetition_penalty: float = 1.0,
    sot_token_id: int = 49406,
    eos_token_id: int = 49407,
    pad_token_id: int = 0,
    compute_dtype=jnp.float32,
    kv_cache: bool = True,
) -> jax.Array:
    """Caption images: returns (B, seq_len) token ids, eos-terminated then padded.

    Single jit, fixed shapes: the ids buffer has static length ``seq_len``.
    ``kv_cache=True`` (default) decodes incrementally against cached text/decoder K/V
    and once-precomputed cross-attention image K/V (generate_cached);
    ``kv_cache=False`` re-encodes the right-padded prefix each step (the reference's
    cache-forced-off scheme, kept for parity testing). Temperature/top-k/top-p
    semantics match the reference's HF-generate paths.
    """
    if kv_cache:
        return generate_cached(
            params, cfg, image, rng, seq_len=seq_len, min_seq_len=min_seq_len,
            generation_type=generation_type, temperature=temperature, top_k=top_k,
            top_p=top_p, repetition_penalty=repetition_penalty,
            sot_token_id=sot_token_id, eos_token_id=eos_token_id,
            pad_token_id=pad_token_id, compute_dtype=compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    b = image.shape[0]
    act = "quick_gelu" if cfg.quick_gelu else "gelu"

    _, image_embs = vit.apply_vision_tower(
        params["visual"], cfg.vision_cfg, image, compute_dtype=compute_dtype, act=act,
    )

    ids0 = jnp.full((b, seq_len), pad_token_id, dtype=jnp.int32).at[:, 0].set(sot_token_id)
    done0 = jnp.zeros((b,), dtype=bool)

    def step(t, carry):
        ids, done, key = carry
        _, token_embs = text_mod.apply_text_tower(
            params["text"], cfg.text_cfg, ids, compute_dtype=compute_dtype, act=act,
        )
        logits = apply_multimodal_decoder(
            params["text_decoder"], cfg.multimodal_cfg, image_embs, token_embs, act=act,
        )
        step_logits = jnp.take_along_axis(
            logits, jnp.full((b, 1, 1), t - 1).astype(jnp.int32), axis=1
        )[:, 0].astype(jnp.float32)  # (B, V)

        if repetition_penalty != 1.0:
            seen = jax.nn.one_hot(ids, logits.shape[-1], dtype=bool)
            seen = seen & (jnp.arange(seq_len) < t)[None, :, None]
            seen = seen.any(axis=1)
            penal = jnp.where(step_logits > 0, step_logits / repetition_penalty, step_logits * repetition_penalty)
            step_logits = jnp.where(seen, penal, step_logits)

        # block eos before min_seq_len (reference min_length semantics)
        neg = jnp.finfo(jnp.float32).min
        step_logits = jnp.where(
            (t < min_seq_len) & (jnp.arange(step_logits.shape[-1]) == eos_token_id)[None, :],
            neg, step_logits,
        )

        if generation_type == "greedy":
            nxt = jnp.argmax(step_logits, axis=-1)
        else:
            step_logits = step_logits / max(temperature, 1e-6)
            if generation_type == "top_k":
                kth = jax.lax.top_k(step_logits, max(top_k, 1))[0][:, -1:]
                step_logits = jnp.where(step_logits < kth, neg, step_logits)
            elif generation_type == "top_p":
                sorted_logits = jnp.sort(step_logits, axis=-1)[:, ::-1]
                probs = jax.nn.softmax(sorted_logits, axis=-1)
                cum = jnp.cumsum(probs, axis=-1)
                cutoff_idx = jnp.sum(cum < top_p, axis=-1, keepdims=True)
                cutoff = jnp.take_along_axis(sorted_logits, cutoff_idx, axis=-1)
                step_logits = jnp.where(step_logits < cutoff, neg, step_logits)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, step_logits, axis=-1)

        nxt = jnp.where(done, pad_token_id, nxt).astype(jnp.int32)
        ids = ids.at[:, t].set(nxt)
        done = done | (nxt == eos_token_id)
        return ids, done, key

    ids, _, _ = jax.lax.fori_loop(1, seq_len, step, (ids0, done0, rng))
    return ids


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------

def convert_multimodal_decoder(sd_prefixed: Dict[str, Any]) -> Dict[str, Any]:
    """Map 'text_decoder.*' reference keys onto the decoder tree (self + cross stacks)."""
    import numpy as np
    import re as _re

    from ..convert import _convert_block_key, _set, _stack_blocks, _to_jnp

    self_blocks: Dict[int, dict] = {}
    cross_blocks: Dict[int, dict] = {}
    tree: Dict[str, Any] = {}
    block_re = _re.compile(r"^(resblocks|cross_attn)\.(\d+)\.(.*)$")
    for k, v in sd_prefixed.items():
        m = block_re.match(k)
        if m:
            group, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            path, val = _convert_block_key(rest, v)
            target = self_blocks if group == "resblocks" else cross_blocks
            _set(target.setdefault(idx, {}), path, val)
        elif k == "ln_final.weight":
            tree.setdefault("ln_final", {})["scale"] = v
        elif k == "ln_final.bias":
            tree.setdefault("ln_final", {})["bias"] = v
        elif k == "text_projection":
            tree["text_projection"] = v
        else:
            raise KeyError(f"unknown text_decoder key {k}")
    tree["blocks"] = _stack_blocks(self_blocks)
    tree["cross_blocks"] = _stack_blocks(cross_blocks)
    return _to_jnp(tree)


def generate_beam(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: jax.Array,
    *,
    seq_len: int = 30,
    min_seq_len: int = 5,
    num_beams: int = 6,
    sot_token_id: int = 49406,
    eos_token_id: int = 49407,
    pad_token_id: int = 0,
    length_penalty: float = 1.0,
    compute_dtype=jnp.float32,
    kv_cache: bool = True,
) -> jax.Array:
    """Beam-search captioning (the reference's default generation_type,
    coca_model.py:300-320 via HF beam search) as a single jitted fixed-shape program:
    beams ride a (B*num_beams) batch axis; each step scores vocab continuations for all
    beams and keeps the top ``num_beams`` by cumulative log-prob. Finished beams
    (eos emitted) are frozen with their final score (length-penalized, HF convention).
    ``kv_cache=True`` (default) decodes each step incrementally against cached K/V,
    re-gathered along the beam axis after every beam reorder — token-identical to the
    re-encode path (kept for parity testing).

    Returns the best beam per image, (B, seq_len), eos-terminated then padded.
    """
    b = image.shape[0]
    act = "quick_gelu" if cfg.quick_gelu else "gelu"
    neg = jnp.finfo(jnp.float32).min

    _, image_embs = vit.apply_vision_tower(
        params["visual"], cfg.vision_cfg, image, compute_dtype=compute_dtype, act=act,
    )
    m = image_embs.shape[1]
    # expand image memory over beams: (B*K, M, W)
    image_embs_k = jnp.repeat(image_embs, num_beams, axis=0)

    k = num_beams
    ids0 = jnp.full((b, k, seq_len), pad_token_id, jnp.int32).at[:, :, 0].set(sot_token_id)
    # only beam 0 is live at t=0 (all beams identical otherwise)
    scores0 = jnp.where(jnp.arange(k) == 0, 0.0, neg)[None, :].repeat(b, axis=0)  # (B, K)
    done0 = jnp.zeros((b, k), bool)

    vocab = params["text"]["token_embedding"].shape[0]
    tcfg, mcfg = cfg.text_cfg, cfg.multimodal_cfg

    if kv_cache:
        k_img, v_img = _cross_kv_all_layers(params, cfg, image_embs_k)
        tk0 = jnp.zeros((tcfg.layers, b * k, seq_len, tcfg.heads,
                         tcfg.width // tcfg.heads), dtype=compute_dtype)
        tv0 = jnp.zeros_like(tk0)
        dk0 = jnp.zeros((mcfg.layers, b * k, seq_len, mcfg.heads,
                         mcfg.width // mcfg.heads), dtype=compute_dtype)
        dv0 = jnp.zeros_like(dk0)

    def _select(t, ids, scores, done, step_logits):
        """Shared beam bookkeeping: score continuations, keep the top K per image."""
        logp = jax.nn.log_softmax(step_logits, axis=-1).reshape(b, k, vocab)

        # block eos before min_seq_len
        eos_col = (jnp.arange(vocab) == eos_token_id)[None, None, :]
        logp = jnp.where((t < min_seq_len) & eos_col, neg, logp)

        # finished beams: only a pad continuation keeps the beam, score unchanged
        pad_col = (jnp.arange(vocab) == pad_token_id)[None, None, :]
        cont = jnp.where(done[..., None], jnp.where(pad_col, 0.0, neg), logp)
        total = scores[..., None] + cont  # (B, K, V)

        flat = total.reshape(b, k * vocab)
        top_scores, top_idx = jax.lax.top_k(flat, k)  # (B, K)
        beam_idx = top_idx // vocab  # (B, K)
        tok_idx = (top_idx % vocab).astype(jnp.int32)

        ids = jnp.take_along_axis(ids, beam_idx[..., None], axis=1)
        done = jnp.take_along_axis(done, beam_idx, axis=1)
        tok_idx = jnp.where(done, pad_token_id, tok_idx)
        ids = ids.at[:, :, t].set(tok_idx)
        done = done | (tok_idx == eos_token_id)
        return ids, top_scores, done, beam_idx

    def step_uncached(t, carry):
        ids, scores, done = carry
        flat_ids = ids.reshape(b * k, seq_len)
        _, token_embs = text_mod.apply_text_tower(
            params["text"], cfg.text_cfg, flat_ids, compute_dtype=compute_dtype, act=act,
        )
        logits = apply_multimodal_decoder(
            params["text_decoder"], cfg.multimodal_cfg, image_embs_k, token_embs, act=act,
        )
        step_logits = jnp.take_along_axis(
            logits, jnp.full((b * k, 1, 1), t - 1, jnp.int32), axis=1
        )[:, 0].astype(jnp.float32)  # (B*K, V)
        ids, scores, done, _ = _select(t, ids, scores, done, step_logits)
        return ids, scores, done

    def step_cached(t, carry):
        ids, scores, done, tk, tv, dk, dv = carry
        tok = jax.lax.dynamic_slice(ids, (0, 0, t - 1), (b, k, 1)).reshape(b * k, 1)
        step_logits, tk, tv, dk, dv = _cached_decode_logits(
            params, cfg, tok, t, tk, tv, dk, dv, k_img, v_img,
            act=act, compute_dtype=compute_dtype)
        ids, scores, done, beam_idx = _select(t, ids, scores, done, step_logits)
        # caches hold per-beam prefixes: re-gather them along the beam axis so
        # slot order matches the surviving beams
        flat_idx = (jnp.arange(b)[:, None] * k + beam_idx).reshape(b * k)
        tk, tv, dk, dv = (jnp.take(c, flat_idx, axis=1) for c in (tk, tv, dk, dv))
        return ids, scores, done, tk, tv, dk, dv

    if kv_cache:
        ids, scores, done, _, _, _, _ = jax.lax.fori_loop(
            1, seq_len, step_cached, (ids0, scores0, done0, tk0, tv0, dk0, dv0))
    else:
        ids, scores, done = jax.lax.fori_loop(
            1, seq_len, step_uncached, (ids0, scores0, done0))

    if length_penalty != 1.0:
        lengths = (ids != pad_token_id).sum(axis=-1).astype(jnp.float32)
        scores = scores / (lengths ** length_penalty)
    best = jnp.argmax(scores, axis=1)
    return jnp.take_along_axis(ids, best[:, None, None], axis=1)[:, 0]
