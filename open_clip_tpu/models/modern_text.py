"""Modern text tower — TPU-native.

Functional re-design of reference ``src/open_clip/transformer.py:957-1577``
(ModernTextTransformer): RoPE (interleaved-pair rotation, cos|sin table computed once
per forward), SwiGLU / GELU / ReLU^2 MLPs, RMSNorm-or-LayerNorm (pre or sandwich
placement), optional qk-norm, gated attention, learned register tokens, layer-0 value
residual (ResFormer), masked mean / eos-with-fallback / MAP attentive pooling.

The depth loop is a stacked ``lax.scan`` carrying (x, v_first); the layer index rides
the scan xs so layer-0-specific behavior (producing v_first) stays branch-free.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextCfg
from ..ops.layers import ACT_FNS, layer_norm, linear, rms_norm
from . import blocks as B

NEG_INF = jnp.finfo(jnp.float32).min


def _norm(x, p, *, norm_type: str, eps: float):
    if norm_type == "rmsnorm":
        return rms_norm(x, p["scale"], eps=eps)
    return layer_norm(x, p["scale"], p.get("bias"), eps=eps)


def _norm_params(width, norm_type):
    if norm_type == "rmsnorm":
        return {"scale": jnp.ones((width,))}
    return {"scale": jnp.ones((width,)), "bias": jnp.zeros((width,))}


def resolve_norm_type(cfg: CLIPTextCfg) -> str:
    return cfg.norm_type if cfg.norm_type is not None else "rmsnorm"


def rope_table(seq_len: int, head_dim: int, temperature: float = 10000.0) -> jnp.ndarray:
    """(seq_len, head_dim) table, cos|sin halves (reference RotaryEmbedding1D)."""
    inv_freq = 1.0 / (temperature ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    pos = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(pos, inv_freq)
    return jnp.asarray(np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1))


def apply_rope_1d(x: jax.Array, table: jax.Array) -> jax.Array:
    """Interleaved-pair rotation (reference _apply_rope_1d). x: (B, L, H, hd); table (L, hd)."""
    cos, sin = jnp.split(table.astype(jnp.float32), 2, axis=-1)  # (L, hd/2) each
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(key, cfg: CLIPTextCfg, norm_type: str, attn_bias: bool, gate_bias: bool, mlp_bias: bool):
    width, heads = cfg.width, cfg.heads
    head_dim = width // heads
    hidden = int(width * cfg.mlp_ratio)
    sandwich = cfg.norm_placement == "sandwich"
    zero_res = cfg.zero_init_residual
    # init scheme: reference init_parameters (transformer.py:1315-1397)
    attn_std = 0.02 if sandwich else width ** -0.5
    fc_std = 0.02 if sandwich else (2 * width) ** -0.5
    proj_std = 0.02 if sandwich else attn_std * ((2 * cfg.layers) ** -0.5)
    swiglu_fc_std = fc_std if sandwich else fc_std * 1.22

    ks = jax.random.split(key, 8)
    p: Dict[str, Any] = {"norm1": _norm_params(width, norm_type), "norm2": _norm_params(width, norm_type)}
    if sandwich:
        p["norm1_post"] = _norm_params(width, norm_type)
        p["norm2_post"] = _norm_params(width, norm_type)

    def res_out(k, in_d, out_d, std):
        if zero_res:
            return jnp.zeros((in_d, out_d))
        return B.normal_init(k, (in_d, out_d), std)

    attn: Dict[str, Any] = {
        "qkv": {"kernel": B.normal_init(ks[0], (width, 3 * width), attn_std)},
        "proj": {"kernel": res_out(ks[1], width, width, proj_std)},
    }
    if attn_bias:
        attn["qkv"]["bias"] = jnp.zeros((3 * width,))
        attn["proj"]["bias"] = jnp.zeros((width,))
    if cfg.qk_norm:
        attn["q_norm"] = _norm_params(head_dim, norm_type)
        attn["k_norm"] = _norm_params(head_dim, norm_type)
    if cfg.attn_gated:
        attn["gate"] = {"kernel": B.normal_init(ks[2], (width, width), attn_std)}
        if gate_bias:
            attn["gate"]["bias"] = jnp.ones((width,))  # mostly-open gate init
    if cfg.value_residual:
        attn["vr_lambda"] = jnp.full((1,), 0.5)
    p["attn"] = attn

    if cfg.mlp_type == "swiglu":
        mlp: Dict[str, Any] = {
            "w12": {"kernel": B.normal_init(ks[3], (width, 2 * hidden), swiglu_fc_std)},
            "w3": {"kernel": res_out(ks[4], hidden, width, proj_std)},
        }
        if mlp_bias:
            mlp["w12"]["bias"] = jnp.zeros((2 * hidden,))
            mlp["w3"]["bias"] = jnp.zeros((width,))
    else:
        mlp = {
            "c_fc": {"kernel": B.normal_init(ks[3], (width, hidden), fc_std)},
            "c_proj": {"kernel": res_out(ks[4], hidden, width, proj_std)},
        }
        if mlp_bias:
            mlp["c_fc"]["bias"] = jnp.zeros((hidden,))
            mlp["c_proj"]["bias"] = jnp.zeros((width,))
    p["mlp"] = mlp

    if cfg.ls_init_value is not None:
        p["ls1"] = jnp.full((width,), cfg.ls_init_value)
        p["ls2"] = jnp.full((width,), cfg.ls_init_value)
    return p


def init_modern_text_tower(key, cfg: CLIPTextCfg, embed_dim: int) -> Dict[str, Any]:
    assert cfg.width % cfg.heads == 0
    norm_type = resolve_norm_type(cfg)
    pool_type = "eos" if cfg.pool_type == "argmax" else cfg.pool_type
    if pool_type == "eos" and cfg.eos_id is None:
        raise ValueError("modern text eos/argmax pooling requires text_cfg.eos_id")
    attn_bias = bool(cfg.attention_bias)
    gate_bias = attn_bias if cfg.gate_bias is None else bool(cfg.gate_bias)
    mlp_bias = bool(cfg.mlp_bias)

    ks = jax.random.split(key, 8)
    tok = B.normal_init(ks[0], (cfg.vocab_size, cfg.width), 0.02)
    if cfg.pad_id is not None:
        tok = tok.at[cfg.pad_id].set(0.0)
    p: Dict[str, Any] = {"token_embedding": tok}
    if cfg.reg_tokens:
        p["reg_tokens"] = B.normal_init(ks[1], (cfg.reg_tokens, cfg.width), 1e-6)
    if cfg.pre_norm:
        p["norm_pre"] = _norm_params(cfg.width, norm_type)

    bkeys = jax.random.split(ks[2], cfg.layers)
    p["blocks"] = jax.vmap(
        lambda k: _init_block(k, cfg, norm_type, attn_bias, gate_bias, mlp_bias)
    )(bkeys)

    p["ln_final"] = _norm_params(cfg.width, norm_type)

    if pool_type == "map":
        head_dim = cfg.width // cfg.heads
        kp = jax.random.split(ks[3], 3)
        pool: Dict[str, Any] = {
            "query": B.normal_init(kp[0], (cfg.width,), cfg.width ** -0.5),
            "q": {"kernel": B.normal_init(kp[1], (cfg.width, cfg.width), cfg.width ** -0.5)},
            "kv": {"kernel": B.normal_init(kp[2], (cfg.width, 2 * cfg.width), cfg.width ** -0.5)},
        }
        if attn_bias:
            pool["q"]["bias"] = jnp.zeros((cfg.width,))
            pool["kv"]["bias"] = jnp.zeros((2 * cfg.width,))
        if cfg.qk_norm:
            pool["q_norm"] = _norm_params(head_dim, norm_type)
            pool["k_norm"] = _norm_params(head_dim, norm_type)
        p["pool"] = pool

    if cfg.proj_type != "none" and embed_dim:
        tp = {"kernel": B.normal_init(ks[4], (cfg.width, embed_dim), cfg.width ** -0.5)}
        if cfg.proj_bias:
            tp["bias"] = jnp.zeros((embed_dim,))
        p["text_projection"] = tp
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _block_apply(p, x, v_first, is_first, *, cfg: CLIPTextCfg, norm_type, eps, rope, key_bias, causal):
    b, l, width = x.shape
    heads = cfg.heads
    hd = width // heads
    act = {"mlp": "gelu", "relu2": "relu2"}.get(cfg.mlp_type)

    h = _norm(x, p["norm1"], norm_type=norm_type, eps=eps)
    qkv = linear(h, p["attn"]["qkv"]["kernel"], p["attn"]["qkv"].get("bias"))
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, l, heads, hd)
    k = k.reshape(b, l, heads, hd)
    v = v.reshape(b, l, heads, hd)

    if cfg.value_residual:
        v_first_new = jnp.where(is_first, v, v_first)
        lam = p["attn"]["vr_lambda"].astype(jnp.float32).reshape(())
        mixed = v_first + lam.astype(v.dtype) * (v - v_first)  # lerp(v_first, v, lam)
        v = jnp.where(is_first, v, mixed)
    else:
        v_first_new = v_first

    if "q_norm" in p["attn"]:
        q = _norm(q, p["attn"]["q_norm"], norm_type=norm_type, eps=eps)
        k = _norm(k, p["attn"]["k_norm"], norm_type=norm_type, eps=eps)
    if rope is not None:
        q = apply_rope_1d(q, rope)
        k = apply_rope_1d(k, rope)

    from ..ops.attention import dot_product_attention

    out = dot_product_attention(q, k, v, bias=key_bias, causal=causal, impl="xla")
    out = out.reshape(b, l, width)
    if "gate" in p["attn"]:
        gate = linear(h, p["attn"]["gate"]["kernel"], p["attn"]["gate"].get("bias"))
        out = out * jax.nn.sigmoid(gate)
    out = linear(out, p["attn"]["proj"]["kernel"], p["attn"]["proj"].get("bias"))
    if "norm1_post" in p:
        out = _norm(out, p["norm1_post"], norm_type=norm_type, eps=eps)
    if "ls1" in p:
        out = out * p["ls1"].astype(out.dtype)
    x = x + out

    h = _norm(x, p["norm2"], norm_type=norm_type, eps=eps)
    if cfg.mlp_type == "swiglu":
        h12 = linear(h, p["mlp"]["w12"]["kernel"], p["mlp"]["w12"].get("bias"))
        u, g = jnp.split(h12, 2, axis=-1)
        h = linear(u * jax.nn.silu(g), p["mlp"]["w3"]["kernel"], p["mlp"]["w3"].get("bias"))
    else:
        h = linear(h, p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"].get("bias"))
        h = ACT_FNS[act](h)
        h = linear(h, p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"].get("bias"))
    if "norm2_post" in p:
        h = _norm(h, p["norm2_post"], norm_type=norm_type, eps=eps)
    if "ls2" in p:
        h = h * p["ls2"].astype(h.dtype)
    return x + h, v_first_new


def _valid_mask(cfg: CLIPTextCfg, text: jax.Array) -> jax.Array:
    """(B, L) bool; guarantees >=1 valid position per row (reference _valid_mask)."""
    if cfg.pad_id is None:
        return jnp.ones_like(text, dtype=bool)
    valid = text != cfg.pad_id
    empty = ~valid.any(axis=1, keepdims=True)
    first = jnp.zeros_like(valid).at[:, 0].set(True)
    return valid | (empty & first)


def apply_modern_text_tower(
    params: Dict[str, Any],
    cfg: CLIPTextCfg,
    text: jax.Array,  # (B, L) int ids
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    norm_type = resolve_norm_type(cfg)
    eps = cfg.norm_eps
    b, l = text.shape
    num_reg = cfg.reg_tokens or 0

    x = params["token_embedding"][text].astype(compute_dtype)
    if num_reg:
        regs = jnp.broadcast_to(params["reg_tokens"].astype(compute_dtype)[None], (b, num_reg, x.shape[-1]))
        x = jnp.concatenate([regs, x], axis=1)
    if "norm_pre" in params:
        x = _norm(x, params["norm_pre"], norm_type=norm_type, eps=eps)

    valid = _valid_mask(cfg, text)
    causal = cfg.attention_mode == "causal"
    key_bias = None
    if not causal:
        key_valid = valid
        if num_reg:
            key_valid = jnp.concatenate([jnp.ones((b, num_reg), bool), valid], axis=1)
        key_bias = jnp.where(key_valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    seq = l + num_reg
    hd = cfg.width // cfg.heads
    rope = rope_table(seq, hd, cfg.rope_temperature) if cfg.pos_embed == "rope" else None

    v_first0 = jnp.zeros((b, seq, cfg.heads, hd), compute_dtype)
    n_layers = cfg.layers

    def body(carry, inp):
        x, v_first = carry
        p, idx = inp
        x, v_first = _block_apply(
            p, x, v_first, idx == 0, cfg=cfg, norm_type=norm_type, eps=eps,
            rope=rope, key_bias=key_bias, causal=causal,
        )
        return (x, v_first), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    (x, _), _ = jax.lax.scan(body, (x, v_first0), (params["blocks"], jnp.arange(n_layers)), unroll=B.scan_unroll())

    x = _norm(x, params["ln_final"], norm_type=norm_type, eps=eps)
    tokens = x[:, num_reg:] if num_reg else x

    pool_type = "eos" if cfg.pool_type == "argmax" else cfg.pool_type
    pooled = _pool(params, cfg, tokens, text, valid, pool_type, norm_type, eps)

    tp = params.get("text_projection")
    if tp is not None:
        pooled = linear(pooled, tp["kernel"], tp.get("bias"))
    return pooled, tokens


def _pool(params, cfg: CLIPTextCfg, x, text, valid, pool_type, norm_type, eps):
    """reference ModernTextPool.forward (transformer.py:1136-1199)."""
    if pool_type == "mean":
        w = valid.astype(jnp.float32)
        return ((x.astype(jnp.float32) * w[..., None]).sum(1) / jnp.maximum(w.sum(1, keepdims=True), 1)).astype(x.dtype)
    if pool_type == "eos":
        eos = text == cfg.eos_id
        last_valid = jnp.maximum(valid.astype(jnp.int32).sum(1) - 1, 0)
        idx = jnp.where(eos.any(axis=1), jnp.argmax(eos.astype(jnp.int32), axis=1), last_valid)
        return jnp.take_along_axis(x, idx[:, None, None], axis=1)[:, 0]
    # map
    if "pool" not in params:
        raise ValueError(
            f"modern text pool_type {pool_type!r} needs attention-pool params; "
            "supported pool types: 'mean', 'eos'/'argmax', 'map'")
    p = params["pool"]
    b, l, width = x.shape
    heads = cfg.heads
    hd = width // heads
    query = jnp.broadcast_to(p["query"].astype(x.dtype)[None, None, :], (b, 1, width))
    q = linear(query, p["q"]["kernel"], p["q"].get("bias")).reshape(b, 1, heads, hd)
    kv = linear(x, p["kv"]["kernel"], p["kv"].get("bias"))
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, l, heads, hd)
    v = v.reshape(b, l, heads, hd)
    if "q_norm" in p:
        q = _norm(q, p["q_norm"], norm_type=norm_type, eps=eps)
        k = _norm(k, p["k_norm"], norm_type=norm_type, eps=eps)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    from ..ops.attention import dot_product_attention

    out = dot_product_attention(q, k, v, bias=bias, impl="xla")
    return out.reshape(b, width)


class ModernTextTransformer:
    """Facade mirroring the reference's ``ModernTextTransformer`` class
    (reference ``src/open_clip/model.py:30``, exported from ``__init__.py:34``)
    over the functional tower: holds (text_cfg, output_dim) and dispatches to
    :func:`init_modern_text_tower` / :func:`apply_modern_text_tower`."""

    def __init__(self, text_cfg: CLIPTextCfg, output_dim: int):
        if isinstance(text_cfg, dict):
            text_cfg = CLIPTextCfg(**text_cfg)
        self.cfg = text_cfg
        self.output_dim = output_dim

    def init(self, key) -> Dict[str, Any]:
        return init_modern_text_tower(key, self.cfg, self.output_dim)

    def __call__(self, params: Dict[str, Any], text, *, compute_dtype=jnp.float32,
                 remat: bool = False, attn_impl: str = "auto"):
        pooled, _tokens = apply_modern_text_tower(
            params, self.cfg, jnp.asarray(text), compute_dtype=compute_dtype,
            remat=remat, attn_impl=attn_impl)
        return pooled

    apply = __call__
