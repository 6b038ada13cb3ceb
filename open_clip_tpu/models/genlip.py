"""GenLIP: unified single-trunk generative vision-language model — TPU-native.

Functional re-design of reference ``src/open_clip/naflex_genlip_model.py``: NaFlex
linear patch embed + tiktoken-style text embedding feed ONE shared trunk under a
prefix-LM mask (image bidirectional, text causal, text->image; built at reference
:407-466), with interleaved 3-axis MRoPE (reference :120-202, Qwen2-VL style),
optionally-gated attention (gate fused into q_proj, :208-271), SwiGLU FFN, LayerScale.
Untied LM head; training loss is the fused linear-CE over the text-predicting window
only (reference :516-539; here ops/fused_ce.py) — full-vocab logits never materialize.

Trunk blocks are stacked + scanned; the prefix-LM additive bias and MRoPE tables are
computed once per forward and threaded through the scan.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fused_ce import fused_linear_cross_entropy
from ..ops.layers import layer_norm, linear, rms_norm
from . import blocks as B

NEG_INF = jnp.finfo(jnp.float32).min


@dataclass
class GenLipVisionCfg:
    image_size: int = 256
    patch_size: int = 16
    in_chans: int = 3
    proj_bias: bool = True
    input_norm: bool = False
    pre_norm: bool = False
    pool_type: str = "avg"


@dataclass
class GenLipTextCfg:
    vocab_size: int = 100280
    context_length: int = 256
    pad_id: int = 100278
    bos_id: int = 100279
    eos_id: int = 100277
    tokenizer_type: str = "tiktoken"
    tiktoken_name: str = "cl100k_base"
    pre_norm: bool = False


@dataclass
class GenLipTrunkCfg:
    width: int = 1152
    depth: int = 27
    num_heads: int = 16
    intermediate_size: int = 3072
    text_embed_dim: int = 1024
    mrope_section: Tuple[int, int, int] = (12, 12, 12)
    rope_theta: float = 10000.0
    ls_init_value: float = 0.1
    drop_path_rate: float = 0.0
    gated_attention: bool = True
    use_swiglu_ffn: bool = True
    mrope_interleaved: bool = True
    hidden_act: str = "silu"
    layer_norm_eps: float = 1e-6
    max_position_embeddings: int = 16384
    attention_bias: bool = False
    mlp_bias: bool = False
    norm_type: str = "layernorm"
    qk_norm: bool = False
    pack_prefix: bool = False

    def __post_init__(self):
        if isinstance(self.mrope_section, list):
            self.mrope_section = tuple(self.mrope_section)


@dataclass
class GenLipModelCfg:
    embed_dim: int
    vision_cfg: GenLipVisionCfg
    text_cfg: GenLipTextCfg
    trunk_cfg: GenLipTrunkCfg

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "GenLipModelCfg":
        def mk(klass, sub):
            names = {f.name for f in dataclasses.fields(klass)}
            return klass(**{k: v for k, v in (sub or {}).items() if k in names})

        return cls(
            embed_dim=d["embed_dim"],
            vision_cfg=mk(GenLipVisionCfg, d.get("vision_cfg")),
            text_cfg=mk(GenLipTextCfg, d.get("text_cfg")),
            trunk_cfg=mk(GenLipTrunkCfg, d.get("genlip_cfg") or d.get("genlap_cfg")),
        )


def _norm(x, p, *, norm_type, eps):
    if norm_type == "rmsnorm":
        return rms_norm(x, p["scale"], eps=eps)
    return layer_norm(x, p["scale"], p.get("bias"), eps=eps)


def _norm_params(w, norm_type):
    return {"scale": jnp.ones((w,))} if norm_type == "rmsnorm" else {"scale": jnp.ones((w,)), "bias": jnp.zeros((w,))}


# ---------------------------------------------------------------------------
# MRoPE
# ---------------------------------------------------------------------------

def mrope_cos_sin(
    position_ids: jax.Array,  # (3, B, S) int
    head_dim: int,
    mrope_section: Tuple[int, int, int],
    theta: float = 10000.0,
    interleaved: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """(cos, sin), each (B, S, head_dim), fp32 — reference GenLipRotaryEmbedding."""
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    inv_freq = jnp.asarray(inv_freq)  # (half,)
    pos = position_ids.astype(jnp.float32)  # (3, B, S)
    freqs = pos[..., None] * inv_freq[None, None, None, :]  # (3, B, S, half)
    if interleaved:
        # [T..H..W..] channel chunks -> interleaved [THWTHW...] (reference :123-139):
        # start from the temporal axis; overwrite the strided H/W channel slots
        ft = freqs[0]
        for axis, offset in ((1, 1), (2, 2)):
            length = mrope_section[axis] * 3
            idx = jnp.arange(offset, length, 3)
            ft = ft.at[..., idx].set(freqs[axis][..., idx])
        f = ft
    else:
        f = freqs[0]
    emb = jnp.concatenate([f, f], axis=-1)  # (B, S, head_dim)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_mrope(q, k, cos, sin):
    """q,k: (B, S, H, hd); cos/sin (B, S, hd) broadcast over heads."""
    c = cos[:, :, None, :].astype(jnp.float32)
    s = sin[:, :, None, :].astype(jnp.float32)
    q32, k32 = q.astype(jnp.float32), k.astype(jnp.float32)
    q_out = q32 * c + _rotate_half(q32) * s
    k_out = k32 * c + _rotate_half(k32) * s
    return q_out.astype(q.dtype), k_out.astype(k.dtype)


# ---------------------------------------------------------------------------
# masks / position ids
# ---------------------------------------------------------------------------

def build_prefix_lm_bias(patch_valid: jax.Array, text_valid: jax.Array) -> jax.Array:
    """Additive fp32 bias (B, 1, S, S) for [image ; text]: image<->image bidirectional,
    text->text causal, text->image; padding keys removed; diagonal forced open
    (reference build_prefix_lm_mask, :407-446)."""
    pv = patch_valid.astype(bool)
    tv = text_valid.astype(bool)
    b, ni = pv.shape
    lt = tv.shape[1]
    s = ni + lt
    valid = jnp.concatenate([pv, tv], axis=1)  # (B, S)
    is_img = jnp.arange(s) < ni
    is_txt = ~is_img
    causal = jnp.tril(jnp.ones((s, s), bool))
    allowed = (
        (is_img[:, None] & is_img[None, :])
        | (is_txt[:, None] & is_txt[None, :] & causal)
        | (is_txt[:, None] & is_img[None, :])
    )  # (S, S)
    allowed = allowed[None] & valid[:, None, :]
    allowed = allowed | jnp.eye(s, dtype=bool)[None]
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]


def build_image_bias(patch_valid: jax.Array) -> jax.Array:
    pv = patch_valid.astype(bool)
    allowed = pv[:, :, None] & pv[:, None, :]
    allowed = allowed | jnp.eye(pv.shape[1], dtype=bool)[None]
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]


def build_image_position_ids(patch_coord: jax.Array) -> jax.Array:
    """(3, B, Ni): t=0, h=y, w=x (reference :550-557)."""
    b, ni, _ = patch_coord.shape
    zeros = jnp.zeros((b, ni), jnp.int32)
    return jnp.stack([zeros, patch_coord[..., 0].astype(jnp.int32), patch_coord[..., 1].astype(jnp.int32)])


def build_mrope_position_ids(patch_coord, patch_valid, text_valid) -> jax.Array:
    """(3, B, S) for [image ; text] (reference :561-593)."""
    b, ni, _ = patch_coord.shape
    lt = text_valid.shape[1]
    h = patch_coord[..., 0].astype(jnp.int32)
    w = patch_coord[..., 1].astype(jnp.int32)
    pv = patch_valid.astype(bool)
    h_v = jnp.where(pv, h, 0)
    w_v = jnp.where(pv, w, 0)
    text_start = jnp.maximum(h_v.max(axis=1), w_v.max(axis=1)) + 1  # (B,)
    text_pos = text_start[:, None] + jnp.arange(lt)[None, :]  # (B, Lt)

    img_part = jnp.stack([jnp.zeros((b, ni), jnp.int32), h, w])  # (3, B, Ni)
    txt_part = jnp.broadcast_to(text_pos[None], (3, b, lt)).astype(jnp.int32)
    return jnp.concatenate([img_part, txt_part], axis=2)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_genlip(key, cfg: GenLipModelCfg) -> Dict[str, Any]:
    t = cfg.trunk_cfg
    v = cfg.vision_cfg
    x = cfg.text_cfg
    width = t.width
    nt = t.norm_type
    ks = jax.random.split(key, 12)
    pdim = v.patch_size * v.patch_size * v.in_chans

    p: Dict[str, Any] = {}
    pe: Dict[str, Any] = {"proj": {"kernel": B.normal_init(ks[0], (pdim, width), 0.02)}}
    if v.proj_bias:
        pe["proj"]["bias"] = jnp.zeros((width,))
    if v.input_norm:
        pe["norm_input"] = {"scale": jnp.ones((pdim,)), "bias": jnp.zeros((pdim,))}
    if v.pre_norm:
        pe["norm_pre"] = _norm_params(width, nt)
    p["patch_embed"] = pe

    emb = B.normal_init(ks[1], (x.vocab_size, t.text_embed_dim), 0.02)
    emb = emb.at[x.pad_id].set(0.0)
    p["text_embed"] = emb
    if t.text_embed_dim != width:
        p["in_proj"] = {"kernel": B.normal_init(ks[2], (t.text_embed_dim, width), 0.02), "bias": jnp.zeros((width,))}
        p["out_proj"] = {"kernel": B.normal_init(ks[3], (width, t.text_embed_dim), 0.02), "bias": jnp.zeros((t.text_embed_dim,))}
    if x.pre_norm:
        p["text_norm_pre"] = _norm_params(width, nt)
    p["lm_head"] = {"kernel": B.normal_init(ks[4], (t.text_embed_dim, x.vocab_size), 0.02)}

    head_dim = width // t.num_heads
    qdim = width * 2 if t.gated_attention else width

    def init_block(k):
        bk = jax.random.split(k, 8)
        attn: Dict[str, Any] = {
            "q_proj": {"kernel": B.xavier_uniform(bk[0], (width, qdim))},
            "k_proj": {"kernel": B.xavier_uniform(bk[1], (width, width))},
            "v_proj": {"kernel": B.xavier_uniform(bk[2], (width, width))},
            "out_proj": {"kernel": B.xavier_uniform(bk[3], (width, width))},
        }
        if t.attention_bias:
            attn["q_proj"]["bias"] = jnp.zeros((qdim,))
            attn["k_proj"]["bias"] = jnp.zeros((width,))
            attn["v_proj"]["bias"] = jnp.zeros((width,))
            attn["out_proj"]["bias"] = jnp.zeros((width,))
        if t.qk_norm:
            attn["q_norm"] = _norm_params(head_dim, nt)
            attn["k_norm"] = _norm_params(head_dim, nt)
        if t.use_swiglu_ffn:
            mlp: Dict[str, Any] = {
                "fc1": {"kernel": B.xavier_uniform(bk[4], (width, t.intermediate_size))},
                "gate_fc": {"kernel": B.xavier_uniform(bk[5], (width, t.intermediate_size))},
                "fc2": {"kernel": B.xavier_uniform(bk[6], (t.intermediate_size, width))},
            }
        else:
            mlp = {
                "fc1": {"kernel": B.xavier_uniform(bk[4], (width, t.intermediate_size))},
                "fc2": {"kernel": B.xavier_uniform(bk[6], (t.intermediate_size, width))},
            }
        if t.mlp_bias:
            for name in mlp:
                out_d = mlp[name]["kernel"].shape[-1]
                mlp[name]["bias"] = B.normal_init(jax.random.fold_in(bk[7], hash(name) % 97), (out_d,), 1e-6)
        blk: Dict[str, Any] = {
            "layer_norm1": _norm_params(width, nt),
            "attn": attn,
            "layer_norm2": _norm_params(width, nt),
            "mlp": mlp,
        }
        if t.ls_init_value is not None and t.ls_init_value > 1e-6:
            blk["ls1"] = jnp.full((width,), t.ls_init_value)
            blk["ls2"] = jnp.full((width,), t.ls_init_value)
        return blk

    p["trunk"] = {
        "blocks": jax.vmap(init_block)(jax.random.split(ks[5], t.depth)),
        "ln_post": _norm_params(width, nt),
    }
    if cfg.embed_dim != width:
        p["visual_proj"] = {"kernel": B.normal_init(ks[6], (width, cfg.embed_dim), 0.02), "bias": jnp.zeros((cfg.embed_dim,))}
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

_ACT = {"silu": jax.nn.silu, "gelu": jax.nn.gelu, "relu": jax.nn.relu}


def _flash_ok(seq: int, hd: int) -> bool:
    from ..ops.attention import _FLASH_MIN_SEQ, _on_tpu

    return _on_tpu() and seq >= _FLASH_MIN_SEQ and hd % 64 == 0


def _apply_trunk_block(p, x, *, t: GenLipTrunkCfg, bias, cos, sin, drop_path_rng=None,
                       train=False, kv_cache=None, return_kv=False):
    """One trunk block. ``kv_cache=(k, v)`` prepends cached (already rotary-positioned)
    keys/values ahead of this call's own — ``bias`` must then cover the extended key
    axis ``(B, 1, S, S_cache + S)``. ``return_kv`` additionally returns this call's
    post-RoPE (k, v) for caching (prefix-LM: image K/V are text-independent)."""
    from jax.ad_checkpoint import checkpoint_name

    from ..ops.attention import dot_product_attention

    nt, eps = t.norm_type, t.layer_norm_eps
    b, s, width = x.shape
    heads = t.num_heads
    hd = width // heads

    h = _norm(x, p["layer_norm1"], norm_type=nt, eps=eps)
    # remat tags mirror blocks.py/ops.attention: the "names*" policies save the
    # block-matmul outputs so the checkpointed backward skips recomputing them
    qg = checkpoint_name(
        linear(h, p["attn"]["q_proj"]["kernel"], p["attn"]["q_proj"].get("bias")),
        "remat_qkv")
    if t.gated_attention:
        q, gate = jnp.split(qg, 2, axis=-1)
        gate = gate.reshape(b, s, heads, hd)
    else:
        q = qg
    k = checkpoint_name(
        linear(h, p["attn"]["k_proj"]["kernel"], p["attn"]["k_proj"].get("bias")),
        "remat_qkv")
    v = checkpoint_name(
        linear(h, p["attn"]["v_proj"]["kernel"], p["attn"]["v_proj"].get("bias")),
        "remat_qkv")
    q = q.reshape(b, s, heads, hd)
    k = k.reshape(b, s, heads, hd)
    v = v.reshape(b, s, heads, hd)
    if "q_norm" in p["attn"]:
        q = _norm(q, p["attn"]["q_norm"], norm_type=nt, eps=eps)
        k = _norm(k, p["attn"]["k_norm"], norm_type=nt, eps=eps)
    q, k = apply_mrope(q, k, cos, sin)
    own_kv = (k, v)
    if kv_cache is not None:
        kc, vc = kv_cache
        k = jnp.concatenate([jnp.broadcast_to(kc, (b,) + kc.shape[1:]).astype(k.dtype), k], axis=1)
        v = jnp.concatenate([jnp.broadcast_to(vc, (b,) + vc.shape[1:]).astype(v.dtype), v], axis=1)
    if isinstance(bias, tuple):
        # structured prefix-LM mask -> Pallas flash kernels (O(L) memory, no
        # (S, S) bias tensor): prefix keys bidirectional, rest causal, padding
        # masked in-kernel (ops/flash_attention.py)
        _, prefix_len, key_valid = bias
        from ..ops.flash_attention import flash_attention

        out = flash_attention(q, k, v, causal=prefix_len > 0,
                              prefix_len=prefix_len, key_valid=key_valid)
    else:
        out = dot_product_attention(q, k, v, bias=bias, impl="xla")
    out = checkpoint_name(out, "remat_attn_ctx")
    if t.gated_attention:
        out = out * jax.nn.sigmoid(gate.astype(jnp.float32)).astype(out.dtype)
    out = out.reshape(b, s, width)
    out = linear(out, p["attn"]["out_proj"]["kernel"], p["attn"]["out_proj"].get("bias"))
    if "ls1" in p:
        out = out * p["ls1"].astype(out.dtype)
    out = _drop_path(out, t.drop_path_rate, drop_path_rng, train, salt=0)
    x = x + out
    if return_kv:
        return _apply_trunk_block_mlp(p, x, t=t, drop_path_rng=drop_path_rng, train=train), own_kv
    return _apply_trunk_block_mlp(p, x, t=t, drop_path_rng=drop_path_rng, train=train)


def _apply_trunk_block_mlp(p, x, *, t: GenLipTrunkCfg, drop_path_rng=None, train=False):
    from jax.ad_checkpoint import checkpoint_name

    nt, eps = t.norm_type, t.layer_norm_eps
    h = _norm(x, p["layer_norm2"], norm_type=nt, eps=eps)
    act = _ACT[t.hidden_act]
    if t.use_swiglu_ffn:
        gate_pre = checkpoint_name(
            linear(h, p["mlp"]["gate_fc"]["kernel"], p["mlp"]["gate_fc"].get("bias")),
            "remat_fc1")
        up = checkpoint_name(
            linear(h, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"].get("bias")),
            "remat_fc1")
        h = linear(act(gate_pre) * up,
                   p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"].get("bias"))
    else:
        fc1_pre = checkpoint_name(
            linear(h, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"].get("bias")),
            "remat_fc1")
        h = linear(act(fc1_pre), p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"].get("bias"))
    if "ls2" in p:
        h = h * p["ls2"].astype(h.dtype)
    h = _drop_path(h, t.drop_path_rate, drop_path_rng, train, salt=1)
    return x + h


def _drop_path(x, rate, rng, train, salt):
    if not train or rate <= 1e-6 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(jax.random.fold_in(rng, salt), keep, (x.shape[0], 1, 1))
    return x * mask.astype(x.dtype) / keep


def trunk_mask(prefix_len: int, key_valid: jax.Array, seq: int, hd: int):
    """Mask argument for apply_trunk: the structured form (flash kernels) when the
    shape qualifies, else the dense additive bias (reference build_prefix_lm_mask
    semantics). ``prefix_len == 0`` means fully bidirectional (image-only trunk)."""
    if _flash_ok(seq, hd):
        return ("prefix", int(prefix_len), key_valid)
    if prefix_len:
        return build_prefix_lm_bias(key_valid[:, :prefix_len], key_valid[:, prefix_len:])
    return build_image_bias(key_valid)


def apply_trunk(params, t: GenLipTrunkCfg, x, bias, cos, sin, *, remat=False, train=False, rng=None):
    def body(carry, inp):
        p, i = inp
        r = None if rng is None else jax.random.fold_in(rng, i)
        return _apply_trunk_block(p, carry, t=t, bias=bias, cos=cos, sin=sin,
                                  drop_path_rng=r, train=train), None

    if remat:
        # honors blocks.REMAT_POLICY ("none" -> full remat, "names*" -> save the
        # tagged matmul outputs; see _apply_trunk_block's checkpoint_name tags)
        body = jax.checkpoint(body, prevent_cse=False, policy=B.remat_policy())
    x, _ = jax.lax.scan(body, x, (params["blocks"], jnp.arange(t.depth)), unroll=B.scan_unroll())
    return _norm(x, params["ln_post"], norm_type=t.norm_type, eps=t.layer_norm_eps)


# ---------------------------------------------------------------------------
# prefix KV cache
#
# TPU-native superset: the reference recomputes the image prefix for every
# caption chunk (scripts/genlip_zeroshot.py:97-119, whose docstring concedes
# full-scale eval "needs a KV-cache (not here)") and for every decode step
# (generation.py:27, cache forced off). Prefix-LM property: image tokens never
# attend text, so their hidden states — and therefore their per-layer K/V — are
# identical in the joint forward. Cached scoring/decoding is exact.
# ---------------------------------------------------------------------------

def build_text_over_prefix_bias(patch_valid: jax.Array, text_valid: jax.Array) -> jax.Array:
    """Additive fp32 bias (B, 1, Lt, Ni+Lt) for text queries over [cached image ; text]:
    exactly the text-query rows of ``build_prefix_lm_bias`` (image keys where valid,
    text keys causal+valid, diagonal forced open)."""
    pv = patch_valid.astype(bool)
    tv = text_valid.astype(bool)
    b, ni = pv.shape
    lt = tv.shape[1]
    img_allowed = jnp.broadcast_to(pv[:, None, :], (b, lt, ni))
    causal = jnp.tril(jnp.ones((lt, lt), bool))
    txt_allowed = (causal[None] & tv[:, None, :]) | jnp.eye(lt, dtype=bool)[None]
    allowed = jnp.concatenate([img_allowed, jnp.broadcast_to(txt_allowed, (b, lt, lt))], axis=-1)
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]


def prefix_cache(params, cfg: GenLipModelCfg, image: Dict[str, jax.Array], *,
                 compute_dtype=jnp.float32, pos_ids: Optional[jax.Array] = None,
                 text_start: Optional[jax.Array] = None,
                 embed_fn=None) -> Dict[str, jax.Array]:
    """Run the trunk over the image prefix once; return per-layer post-RoPE K/V
    (depth, B, Ni, H, hd), the post-``out_proj`` hidden at the last prefix position
    (whose logits predict text token 0 in the reference scoring protocol), the patch
    validity, and the MRoPE text start position.

    ``pos_ids`` / ``text_start`` / ``embed_fn`` override the image defaults so the
    GenLAP audio prefix (1-D time / 2-D freq-time RoPE, mel patch embed) can share
    this cache (see models/genlap.prefix_cache)."""
    t = cfg.trunk_cfg
    pv = image["patch_valid"].astype(bool)
    x = (embed_fn or (lambda p, c, pt, dt: embed_patches(p, c, pt, dt)))(
        params, cfg, image["patches"], compute_dtype)
    hd = t.width // t.num_heads
    pos = build_image_position_ids(image["patch_coord"]) if pos_ids is None else pos_ids
    cos, sin = mrope_cos_sin(pos, hd, t.mrope_section, t.rope_theta, t.mrope_interleaved)
    # exactly the image-query rows of build_prefix_lm_bias: every image query (even a
    # padded one — the reference scores from position ni-1 regardless) attends all
    # valid image keys, diagonal forced open. build_image_bias differs for padded
    # queries (attend nothing but self), which would change last_hidden.
    b_, ni_ = pv.shape
    allowed = jnp.broadcast_to(pv[:, None, :], (b_, ni_, ni_)) | jnp.eye(ni_, dtype=bool)[None]
    bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]

    def body(carry, p):
        return _apply_trunk_block(p, carry, t=t, bias=bias, cos=cos, sin=sin, return_kv=True)

    x, (kc, vc) = jax.lax.scan(body, x, params["trunk"]["blocks"], unroll=B.scan_unroll())
    h = _norm(x, params["trunk"]["ln_post"], norm_type=t.norm_type, eps=t.layer_norm_eps)
    last = h[:, -1, :]
    if "out_proj" in params:
        last = linear(last, params["out_proj"]["kernel"], params["out_proj"].get("bias"))

    if text_start is None:
        h_v = jnp.where(pv, image["patch_coord"][..., 0].astype(jnp.int32), 0)
        w_v = jnp.where(pv, image["patch_coord"][..., 1].astype(jnp.int32), 0)
        text_start = jnp.maximum(h_v.max(axis=1), w_v.max(axis=1)) + 1  # (B,)
    return {"k": kc, "v": vc, "last_hidden": last, "patch_valid": pv,
            "text_start": text_start}


def _apply_trunk_cached(params, t: GenLipTrunkCfg, x, cache_kv, bias, cos, sin):
    """Trunk over text-only ``x`` with per-layer cached prefix K/V prepended."""
    def body(carry, inp):
        p, kc, vc = inp
        return _apply_trunk_block(p, carry, t=t, bias=bias, cos=cos, sin=sin,
                                  kv_cache=(kc, vc)), None

    x, _ = jax.lax.scan(body, x, (params["blocks"], cache_kv[0], cache_kv[1]),
                        unroll=B.scan_unroll())
    return _norm(x, params["ln_post"], norm_type=t.norm_type, eps=t.layer_norm_eps)


def score_captions(params, cfg: GenLipModelCfg, cache: Dict[str, jax.Array],
                   text: jax.Array, text_valid: Optional[jax.Array] = None, *,
                   compute_dtype=jnp.float32) -> jax.Array:
    """Length-normalized ``log P(caption | image)`` per row, (B,), from a prefix cache.

    Matches the reference scoring protocol (scripts/genlip_zeroshot.py:97-119): caption
    token ``text[:, j]`` at global position ``ni + j`` is scored by the logits at
    ``ni - 1 + j``; the ``j == 0`` term comes from the cached last-prefix hidden. The
    cache may hold 1 image against a batch of captions (broadcast) or one per row."""
    t = cfg.trunk_cfg
    tc = cfg.text_cfg
    if text_valid is None:
        text_valid = text != tc.pad_id
    b, lt = text.shape
    hd = t.width // t.num_heads

    x = embed_text(params, cfg, text, compute_dtype)
    text_pos = cache["text_start"][:, None] + jnp.arange(lt)[None, :]  # (Bc, Lt)
    text_pos = jnp.broadcast_to(text_pos, (b, lt))
    pos = jnp.broadcast_to(text_pos[None], (3, b, lt)).astype(jnp.int32)
    cos, sin = mrope_cos_sin(pos, hd, t.mrope_section, t.rope_theta, t.mrope_interleaved)
    pv = jnp.broadcast_to(cache["patch_valid"], (b, cache["patch_valid"].shape[1]))
    bias = build_text_over_prefix_bias(pv, text_valid)

    h = _apply_trunk_cached(params["trunk"], t, x, (cache["k"], cache["v"]), bias, cos, sin)
    if "out_proj" in params:
        h = linear(h, params["out_proj"]["kernel"], params["out_proj"].get("bias"))
    w = params["lm_head"]["kernel"]
    logits_txt = jnp.dot(h, w.astype(h.dtype))  # (B, Lt, V)
    first = jnp.dot(cache["last_hidden"].astype(h.dtype), w.astype(h.dtype))  # (Bc, V)
    first = jnp.broadcast_to(first, (b, first.shape[-1]))
    pred = jnp.concatenate([first[:, None], logits_txt[:, :-1]], axis=1).astype(jnp.float32)
    token_lp = jax.nn.log_softmax(pred, axis=-1)
    token_lp = jnp.take_along_axis(token_lp, text[..., None].astype(jnp.int32), axis=-1)[..., 0]
    token_lp = jnp.where(text_valid, token_lp, 0.0)
    return token_lp.sum(1) / jnp.clip(text_valid.sum(1), 1, None)


def embed_patches(params, cfg: GenLipModelCfg, patches, compute_dtype):
    pe = params["patch_embed"]
    x = patches.astype(compute_dtype)
    if "norm_input" in pe:
        x = layer_norm(x, pe["norm_input"]["scale"], pe["norm_input"]["bias"])
    x = linear(x, pe["proj"]["kernel"], pe["proj"].get("bias"))
    if "norm_pre" in pe:
        x = _norm(x, pe["norm_pre"], norm_type=cfg.trunk_cfg.norm_type, eps=cfg.trunk_cfg.layer_norm_eps)
    return x


def embed_text(params, cfg: GenLipModelCfg, text, compute_dtype):
    x = params["text_embed"][text].astype(compute_dtype)
    if "in_proj" in params:
        x = linear(x, params["in_proj"]["kernel"], params["in_proj"].get("bias"))
    if "text_norm_pre" in params:
        x = _norm(x, params["text_norm_pre"], norm_type=cfg.trunk_cfg.norm_type, eps=cfg.trunk_cfg.layer_norm_eps)
    return x


def encode_image(params, cfg: GenLipModelCfg, image: Dict[str, jax.Array], *,
                 normalize: bool = False, compute_dtype=jnp.float32, remat: bool = False):
    """Vision-encoder face: trunk over image patches only + masked mean pool
    (reference NaFlexGenLipVisualAdapter, :633-680)."""
    pv = image["patch_valid"].astype(bool)
    x = embed_patches(params, cfg, image["patches"], compute_dtype)
    bias = trunk_mask(0, pv, x.shape[1], cfg.trunk_cfg.width // cfg.trunk_cfg.num_heads)
    pos = build_image_position_ids(image["patch_coord"])
    cos, sin = mrope_cos_sin(pos, cfg.trunk_cfg.width // cfg.trunk_cfg.num_heads,
                             cfg.trunk_cfg.mrope_section, cfg.trunk_cfg.rope_theta,
                             cfg.trunk_cfg.mrope_interleaved)
    x = apply_trunk(params["trunk"], cfg.trunk_cfg, x, bias, cos, sin, remat=remat)
    w = pv.astype(jnp.float32)[..., None]
    pooled = ((x.astype(jnp.float32) * w).sum(1) / jnp.maximum(w.sum(1), 1.0)).astype(x.dtype)
    if "visual_proj" in params:
        pooled = linear(pooled, params["visual_proj"]["kernel"], params["visual_proj"].get("bias"))
    if normalize:
        from .clip import _l2_normalize

        pooled = _l2_normalize(pooled)
    return pooled


def patch_features(params, cfg: GenLipModelCfg, image: Dict[str, jax.Array], *,
                   compute_dtype=jnp.float32, remat: bool = False):
    """Last-layer patch hiddens (B, Ni, width), post ln_post, image-only mask — the
    frozen-backbone probe protocol (reference scripts/genlip_attentive_probe.py:57-67,
    which pools these with a trained AttentionPoolLatent head)."""
    pv = image["patch_valid"].astype(bool)
    x = embed_patches(params, cfg, image["patches"], compute_dtype)
    bias = trunk_mask(0, pv, x.shape[1], cfg.trunk_cfg.width // cfg.trunk_cfg.num_heads)
    pos = build_image_position_ids(image["patch_coord"])
    cos, sin = mrope_cos_sin(pos, cfg.trunk_cfg.width // cfg.trunk_cfg.num_heads,
                             cfg.trunk_cfg.mrope_section, cfg.trunk_cfg.rope_theta,
                             cfg.trunk_cfg.mrope_interleaved)
    return apply_trunk(params["trunk"], cfg.trunk_cfg, x, bias, cos, sin, remat=remat)


def genlip_forward(
    params: Dict[str, Any],
    cfg: GenLipModelCfg,
    image: Dict[str, jax.Array],
    text: jax.Array,
    text_valid: Optional[jax.Array] = None,
    *,
    compute_loss: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """reference NaFlexGenLip.forward (:757-847)."""
    t = cfg.trunk_cfg
    if text_valid is None:
        text_valid = text != cfg.text_cfg.pad_id
    pv = image["patch_valid"].astype(bool)

    if compute_loss and t.pack_prefix:
        loss = packed_caption_loss(
            params, cfg,
            embed_patches(params, cfg, image["patches"], compute_dtype), pv,
            build_mrope_position_ids(image["patch_coord"], pv, text_valid),
            text, text_valid, compute_dtype=compute_dtype, remat=remat,
        )
        return {"loss": loss}

    img_emb = embed_patches(params, cfg, image["patches"], compute_dtype)
    txt_emb = embed_text(params, cfg, text, compute_dtype)
    h = jnp.concatenate([img_emb, txt_emb], axis=1)
    ni = img_emb.shape[1]

    bias = trunk_mask(ni, jnp.concatenate([pv, text_valid.astype(bool)], axis=1),
                      h.shape[1], t.width // t.num_heads)
    pos = build_mrope_position_ids(image["patch_coord"], pv, text_valid)
    cos, sin = mrope_cos_sin(pos, t.width // t.num_heads, t.mrope_section, t.rope_theta, t.mrope_interleaved)

    h = apply_trunk(params["trunk"], t, h, bias, cos, sin, remat=remat, train=train, rng=rng)
    if "out_proj" in params:
        h = linear(h, params["out_proj"]["kernel"], params["out_proj"].get("bias"))

    if compute_loss:
        pred = h[:, ni - 1 : -1, :]  # positions predicting the caption tokens
        target = jnp.where(text_valid, text, -100)
        loss = fused_linear_cross_entropy(
            pred.reshape(-1, pred.shape[-1]),
            params["lm_head"]["kernel"].T,  # (V, D) layout for the op
            target.reshape(-1),
            ignore_index=-100,
        )
        return {"loss": loss}
    logits = jnp.dot(h, params["lm_head"]["kernel"].astype(h.dtype))
    return {"logits": logits, "image_seq_len": ni}


def _sample_next(step_logits, key, generation_type, temperature, top_k, top_p):
    """Next-token sampling shared by the cached and uncached decode loops."""
    if generation_type == "greedy":
        return jnp.argmax(step_logits, axis=-1)
    if generation_type == "top_k":
        lg = step_logits / max(temperature, 1e-6)
        kth = jnp.sort(lg, axis=-1)[:, -top_k][:, None]
        lg = jnp.where(lg < kth, jnp.finfo(jnp.float32).min, lg)
        return jax.random.categorical(key, lg, axis=-1)
    if generation_type == "top_p":
        lg = step_logits / max(temperature, 1e-6)
        srt = jnp.sort(lg, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(srt, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cut = jnp.sum(cum < top_p, axis=-1)
        thresh = jnp.take_along_axis(srt, cut[:, None], axis=-1)
        lg = jnp.where(lg < thresh, jnp.finfo(jnp.float32).min, lg)
        return jax.random.categorical(key, lg, axis=-1)
    raise ValueError(f"unknown generation_type {generation_type!r}")


def generate_cached(
    params: Dict[str, Any],
    cfg: GenLipModelCfg,
    image: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    *,
    seq_len: int = 32,
    min_seq_len: int = 1,
    generation_type: str = "greedy",
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.1,
    compute_dtype=jnp.float32,
    cache: Optional[Dict[str, jax.Array]] = None,
) -> jax.Array:
    """KV-cached incremental decode: the image prefix runs through the trunk ONCE
    (prefix_cache) and each step processes a single text position against the cached
    prefix + text K/V. O(T·(Ni+T)·D) attention vs the uncached loop's
    O(T·(Ni+T)²·D) — token-for-token identical to ``generate`` (greedy), tested.
    The reference has no cache at all (generation.py:27 forces it off).

    Pass a prebuilt ``cache`` (e.g. genlap.prefix_cache for an audio prefix) to decode
    against a non-image prefix; ``image`` is then only read for the batch size."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    tc, t = cfg.text_cfg, cfg.trunk_cfg
    b = image["patches"].shape[0]
    heads = t.num_heads
    hd = t.width // heads

    if cache is None:
        cache = prefix_cache(params, cfg, image, compute_dtype=compute_dtype)
    pv = cache["patch_valid"]
    ni = pv.shape[1]

    # rope tables for every text position, computed once: (B, seq_len, hd)
    text_pos = cache["text_start"][:, None] + jnp.arange(seq_len)[None, :]
    pos = jnp.broadcast_to(text_pos[None], (3, b, seq_len)).astype(jnp.int32)
    cos_all, sin_all = mrope_cos_sin(pos, hd, t.mrope_section, t.rope_theta,
                                     t.mrope_interleaved)

    ids0 = jnp.full((b, seq_len), tc.pad_id, dtype=jnp.int32).at[:, 0].set(tc.bos_id)
    done0 = jnp.zeros((b,), dtype=bool)
    kt0 = jnp.zeros((t.depth, b, seq_len, heads, hd), dtype=compute_dtype)
    vt0 = jnp.zeros_like(kt0)

    def step(t_i, carry):
        # query = text position t_i - 1 (token ids[:, t_i - 1]) predicting ids[:, t_i]
        ids, done, key, kt, vt = carry
        tok = jax.lax.dynamic_slice(ids, (0, t_i - 1), (b, 1))
        x = embed_text(params, cfg, tok, compute_dtype)
        cos = jax.lax.dynamic_slice(cos_all, (0, t_i - 1, 0), (b, 1, hd))
        sin = jax.lax.dynamic_slice(sin_all, (0, t_i - 1, 0), (b, 1, hd))

        # keys per layer: [image (ni), text buffer (seq_len; slots < t_i-1), self (1)]
        txt_key_ok = (jnp.arange(seq_len) < (t_i - 1))[None, :]
        allowed = jnp.concatenate(
            [pv, jnp.broadcast_to(txt_key_ok, (b, seq_len)),
             jnp.ones((b, 1), bool)], axis=1)  # (B, ni + seq_len + 1)
        bias = jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

        def body(carry_x, inp):
            p, k_img, v_img, kt_l, vt_l = inp
            kv = (jnp.concatenate([k_img.astype(compute_dtype), kt_l], axis=1),
                  jnp.concatenate([v_img.astype(compute_dtype), vt_l], axis=1))
            out, (k_new, v_new) = _apply_trunk_block(
                p, carry_x, t=t, bias=bias, cos=cos, sin=sin,
                kv_cache=kv, return_kv=True)
            return out, (k_new.astype(compute_dtype), v_new.astype(compute_dtype))

        x, (k_new, v_new) = jax.lax.scan(
            body, x, (params["trunk"]["blocks"], cache["k"], cache["v"], kt, vt),
            unroll=B.scan_unroll())
        kt = jax.lax.dynamic_update_slice(kt, k_new, (0, 0, t_i - 1, 0, 0))
        vt = jax.lax.dynamic_update_slice(vt, v_new, (0, 0, t_i - 1, 0, 0))

        h = _norm(x, params["trunk"]["ln_post"], norm_type=t.norm_type,
                  eps=t.layer_norm_eps)[:, 0]
        if "out_proj" in params:
            h = linear(h, params["out_proj"]["kernel"], params["out_proj"].get("bias"))
        step_logits = jnp.dot(h, params["lm_head"]["kernel"].astype(h.dtype)).astype(jnp.float32)
        step_logits = jnp.where(
            (t_i < min_seq_len),
            step_logits.at[:, tc.eos_id].set(jnp.finfo(jnp.float32).min), step_logits)

        key, sub = jax.random.split(key)
        nxt = _sample_next(step_logits, sub, generation_type, temperature, top_k, top_p)
        nxt = jnp.where(done, tc.pad_id, nxt).astype(jnp.int32)
        ids = jax.lax.dynamic_update_slice(ids, nxt[:, None], (0, t_i))
        done = done | (nxt == tc.eos_id)
        return ids, done, key, kt, vt

    ids, _, _, _, _ = jax.lax.fori_loop(1, seq_len, step, (ids0, done0, rng, kt0, vt0))
    return ids


def generate(
    params: Dict[str, Any],
    cfg: GenLipModelCfg,
    image: Dict[str, jax.Array],
    rng: Optional[jax.Array] = None,
    *,
    seq_len: int = 32,
    min_seq_len: int = 1,
    generation_type: str = "greedy",  # greedy | top_k | top_p
    temperature: float = 1.0,
    top_k: int = 1,
    top_p: float = 0.1,
    compute_dtype=jnp.float32,
    kv_cache: bool = True,
) -> jax.Array:
    """Caption images with the prefix-LM trunk (superset: the reference exposes
    generation only for CoCa, generation.py:27). Same fixed-shape single-jit
    scheme as models/coca.generate: a static (B, seq_len) ids buffer seeded with
    bos; ``kv_cache=True`` (default) runs the prefix once and decodes incrementally
    (generate_cached); ``kv_cache=False`` re-runs the trunk on [image ; ids] each
    step (the reference's cache-less scheme, kept for parity testing)."""
    if kv_cache:
        return generate_cached(
            params, cfg, image, rng, seq_len=seq_len, min_seq_len=min_seq_len,
            generation_type=generation_type, temperature=temperature, top_k=top_k,
            top_p=top_p, compute_dtype=compute_dtype)
    if rng is None:
        rng = jax.random.PRNGKey(0)
    tc = cfg.text_cfg
    b = image["patches"].shape[0]
    ids0 = jnp.full((b, seq_len), tc.pad_id, dtype=jnp.int32).at[:, 0].set(tc.bos_id)
    done0 = jnp.zeros((b,), dtype=bool)

    def step(t, carry):
        ids, done, key = carry
        text_valid = (jnp.arange(seq_len) < t)[None, :].repeat(b, 0)
        out = genlip_forward(params, cfg, image, ids, text_valid=text_valid,
                             compute_dtype=compute_dtype)
        ni = out["image_seq_len"]
        step_logits = jnp.take_along_axis(
            out["logits"], jnp.full((b, 1, 1), ni + t - 1).astype(jnp.int32), axis=1
        )[:, 0].astype(jnp.float32)  # (B, V)
        step_logits = jnp.where(
            (t < min_seq_len),
            step_logits.at[:, tc.eos_id].set(jnp.finfo(jnp.float32).min), step_logits)

        key, sub = jax.random.split(key)
        nxt = _sample_next(step_logits, sub, generation_type, temperature, top_k, top_p)
        nxt = jnp.where(done, tc.pad_id, nxt).astype(jnp.int32)
        ids = ids.at[:, t].set(nxt)
        done = done | (nxt == tc.eos_id)
        return ids, done, key

    ids, _, _ = jax.lax.fori_loop(1, seq_len, step, (ids0, done0, rng))
    return ids


# ---------------------------------------------------------------------------
# converter + facade
# ---------------------------------------------------------------------------

def torch_genlip_to_params(sd, cfg: GenLipModelCfg) -> Dict[str, Any]:
    """Reference NaFlexGenLip state dict -> param tree. The visual adapter holds
    references to the shared trunk modules, so its duplicated keys are skipped
    (only visual.proj.* is adapter-owned)."""
    import numpy as np
    import re as _re

    from ..convert import normalize_torch_state_dict, _set, _stack_blocks, _to_jnp

    sd = normalize_torch_state_dict(sd)
    tree: Dict[str, Any] = {}
    per_layer: Dict[int, dict] = {}
    layer_re = _re.compile(r"^trunk\.layers\.(\d+)\.(.*)$")

    suffix_map = {
        "layer_norm1.weight": ("layer_norm1", "scale"),
        "layer_norm1.bias": ("layer_norm1", "bias"),
        "layer_norm2.weight": ("layer_norm2", "scale"),
        "layer_norm2.bias": ("layer_norm2", "bias"),
        "self_attn.q_proj.weight": ("attn", "q_proj", "kernel"),
        "self_attn.q_proj.bias": ("attn", "q_proj", "bias"),
        "self_attn.k_proj.weight": ("attn", "k_proj", "kernel"),
        "self_attn.k_proj.bias": ("attn", "k_proj", "bias"),
        "self_attn.v_proj.weight": ("attn", "v_proj", "kernel"),
        "self_attn.v_proj.bias": ("attn", "v_proj", "bias"),
        "self_attn.out_proj.weight": ("attn", "out_proj", "kernel"),
        "self_attn.out_proj.bias": ("attn", "out_proj", "bias"),
        "self_attn.q_norm.weight": ("attn", "q_norm", "scale"),
        "self_attn.q_norm.bias": ("attn", "q_norm", "bias"),
        "self_attn.k_norm.weight": ("attn", "k_norm", "scale"),
        "self_attn.k_norm.bias": ("attn", "k_norm", "bias"),
        "mlp.fc1.weight": ("mlp", "fc1", "kernel"),
        "mlp.fc1.bias": ("mlp", "fc1", "bias"),
        "mlp.gate_fc.weight": ("mlp", "gate_fc", "kernel"),
        "mlp.gate_fc.bias": ("mlp", "gate_fc", "bias"),
        "mlp.fc2.weight": ("mlp", "fc2", "kernel"),
        "mlp.fc2.bias": ("mlp", "fc2", "bias"),
        "layer_scale1.lambda1": ("ls1",),
        "layer_scale2.lambda1": ("ls2",),
    }

    for k, v in sd.items():
        if k.startswith("visual.") and not k.startswith("visual.proj."):
            continue  # duplicate references to shared modules
        m = layer_re.match(k)
        if m:
            idx, rest = int(m.group(1)), m.group(2)
            path = suffix_map[rest]
            val = v.T if rest.endswith(".weight") and ("proj" in rest or "fc" in rest) and "norm" not in rest else v
            _set(per_layer.setdefault(idx, {}), path, val)
            continue
        if k == "patch_embed.proj.weight":
            _set(tree, ("patch_embed", "proj", "kernel"), v.T)
        elif k == "patch_embed.proj.bias":
            _set(tree, ("patch_embed", "proj", "bias"), v)
        elif k.startswith("patch_embed.norm_input."):
            _set(tree, ("patch_embed", "norm_input", "scale" if k.endswith("weight") else "bias"), v)
        elif k.startswith("patch_embed.norm_pre."):
            _set(tree, ("patch_embed", "norm_pre", "scale" if k.endswith("weight") else "bias"), v)
        elif k == "text_embed.weight":
            tree["text_embed"] = v
        elif k == "in_proj.weight":
            _set(tree, ("in_proj", "kernel"), v.T)
        elif k == "in_proj.bias":
            _set(tree, ("in_proj", "bias"), v)
        elif k == "out_proj.weight":
            _set(tree, ("out_proj", "kernel"), v.T)
        elif k == "out_proj.bias":
            _set(tree, ("out_proj", "bias"), v)
        elif k.startswith("text_norm_pre."):
            _set(tree, ("text_norm_pre", "scale" if k.endswith("weight") else "bias"), v)
        elif k == "lm_head.weight":
            _set(tree, ("lm_head", "kernel"), v.T)
        elif k == "trunk.ln_post.weight":
            _set(tree, ("trunk", "ln_post", "scale"), v)
        elif k == "trunk.ln_post.bias":
            _set(tree, ("trunk", "ln_post", "bias"), v)
        elif k == "visual.proj.weight":
            _set(tree, ("visual_proj", "kernel"), v.T)
        elif k == "visual.proj.bias":
            _set(tree, ("visual_proj", "bias"), v)
        else:
            raise KeyError(f"unknown genlip key {k}")

    tree.setdefault("trunk", {})["blocks"] = _stack_blocks(per_layer)
    return _to_jnp(tree)


class GenLipModel:
    """Facade bundling (cfg, params) with the reference NaFlexGenLip surface:
    encode_image(image_dict, normalize), forward(image, text, compute_loss)."""

    def __init__(self, cfg: GenLipModelCfg, params: Dict[str, Any], compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.pad_id = cfg.text_cfg.pad_id
        self.context_length = cfg.text_cfg.context_length

    def encode_image(self, image, normalize: bool = False):
        image = {k: jnp.asarray(v) for k, v in image.items()}
        return encode_image(self.params, self.cfg, image, normalize=normalize,
                            compute_dtype=self.compute_dtype)

    def __call__(self, image, text, text_valid=None, compute_loss: bool = False):
        image = {k: jnp.asarray(v) for k, v in image.items()}
        return genlip_forward(self.params, self.cfg, image, jnp.asarray(text),
                              text_valid, compute_loss=compute_loss,
                              compute_dtype=self.compute_dtype)

    def generate(self, image, **kw):
        """Caption images with the prefix-LM trunk (see module-level generate)."""
        image = {k: jnp.asarray(v) for k, v in image.items()}
        return generate(self.params, self.cfg, image,
                        compute_dtype=self.compute_dtype, **kw)

    def prefix_cache(self, image):
        """Image-prefix KV cache for score_captions (see module-level prefix_cache)."""
        image = {k: jnp.asarray(v) for k, v in image.items()}
        return prefix_cache(self.params, self.cfg, image, compute_dtype=self.compute_dtype)

    def score_captions(self, cache, text, text_valid=None):
        """Length-normalized log P(caption | cached prefix), (B,)."""
        return score_captions(self.params, self.cfg, cache, jnp.asarray(text), text_valid,
                              compute_dtype=self.compute_dtype)


# ---------------------------------------------------------------------------
# packed prefix layout (pack_prefix=True)
# ---------------------------------------------------------------------------

def build_packed_prefix_lm_bias(prefix_pos: jax.Array, text_pos: jax.Array) -> jax.Array:
    """Additive bias for the packed [valid prefix ; valid text ; PAD] layout
    (reference build_packed_prefix_lm_mask, :518-539): per-row prefix/text split,
    prefix<->prefix bidirectional, text->text causal, text->prefix; pads masked,
    diagonal forced open."""
    b, t = prefix_pos.shape
    valid = prefix_pos | text_pos
    causal = jnp.tril(jnp.ones((t, t), bool))
    allowed = (
        (prefix_pos[:, :, None] & prefix_pos[:, None, :])
        | (text_pos[:, :, None] & text_pos[:, None, :] & causal[None])
        | (text_pos[:, :, None] & prefix_pos[:, None, :])
    )
    allowed = allowed & valid[:, None, :]
    allowed = allowed | jnp.eye(t, dtype=bool)[None]
    return jnp.where(allowed, 0.0, NEG_INF).astype(jnp.float32)[:, None]


def pack_prefix_sequence(
    prefix_emb: jax.Array,  # (B, Np, W)
    prefix_valid: jax.Array,  # (B, Np) bool, front-contiguous
    block_pos: jax.Array,  # (3, B, Np+Nt)
    text_emb: jax.Array,  # (B, Nt, W)
    text_valid: jax.Array,  # (B, Nt) bool, front-contiguous
):
    """Static-shape packing (reference pack_prefix_sequence, :468-516): each row becomes
    [valid prefix ; valid text ; PAD] of the SAME total length T = Np + Nt (jit needs a
    static T; the reference shrinks T to the batch max, which the data pipeline's
    tighter buckets achieve here instead).

    Returns (combined (B,T,W), pos (3,B,T), bias (B,1,T,T), k (B,), m (B,))."""
    b, n_prefix, width = prefix_emb.shape
    n_text = text_emb.shape[1]
    t = n_prefix + n_text
    k = prefix_valid.astype(jnp.int32).sum(axis=1)  # (B,)
    m = text_valid.astype(jnp.int32).sum(axis=1)

    cols = jnp.arange(t)[None, :]  # (1, T)
    prefix_dst = cols < k[:, None]
    text_dst = (cols >= k[:, None]) & (cols < (k + m)[:, None])

    # gather index into the concatenated [prefix ; text] source
    gather_idx = jnp.where(
        prefix_dst, cols, jnp.where(text_dst, n_prefix + cols - k[:, None], 0)
    ).astype(jnp.int32)

    concat_emb = jnp.concatenate([prefix_emb, text_emb], axis=1)  # (B, T, W)
    combined = jnp.take_along_axis(concat_emb, gather_idx[..., None], axis=1)
    combined = combined * (prefix_dst | text_dst)[..., None].astype(combined.dtype)

    pos = jnp.take_along_axis(block_pos, gather_idx[None], axis=2)

    bias = build_packed_prefix_lm_bias(prefix_dst, text_dst)
    return combined, pos, bias, k, m


def packed_caption_loss(
    params: Dict[str, Any],
    cfg,  # GenLipModelCfg or GenLapModelCfg (shared trunk slots)
    prefix_emb: jax.Array,
    prefix_valid: jax.Array,
    block_pos: jax.Array,
    text: jax.Array,
    text_valid: jax.Array,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    """Fused AR caption CE over the packed layout (reference packed_caption_loss,
    :516-539): the first caption token is predicted from the last VALID prefix token."""
    t_cfg = cfg.trunk_cfg
    txt_emb = embed_text(params, cfg, text, compute_dtype)
    combined, pos, bias, k, m = pack_prefix_sequence(
        prefix_emb, prefix_valid.astype(bool), block_pos, txt_emb, text_valid.astype(bool)
    )
    cos, sin = mrope_cos_sin(pos, t_cfg.width // t_cfg.num_heads, t_cfg.mrope_section,
                             t_cfg.rope_theta, t_cfg.mrope_interleaved)
    h = apply_trunk(params["trunk"], t_cfg, combined, bias, cos, sin, remat=remat)
    if "out_proj" in params:
        h = linear(h, params["out_proj"]["kernel"], params["out_proj"].get("bias"))

    # position j predicts caption token (j - (k-1)) for j in [k-1, k+m-1)
    t_len = h.shape[1]
    cols = jnp.arange(t_len)[None, :]
    pred_dst = (cols >= (k - 1)[:, None]) & (cols < (k + m - 1)[:, None])
    tok_idx = jnp.clip(cols - (k - 1)[:, None], 0, text.shape[1] - 1)
    labels = jnp.take_along_axis(text, tok_idx, axis=1)
    labels = jnp.where(pred_dst, labels, -100)

    return fused_linear_cross_entropy(
        h.reshape(-1, h.shape[-1]),
        params["lm_head"]["kernel"].T,
        labels.reshape(-1),
        ignore_index=-100,
    )
