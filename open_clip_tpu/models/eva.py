"""EVA vision towers (EVA01-giant / EVA02) — TPU-native.

The reference outsources these to ``timm`` (reference ``src/open_clip/timm_model.py:25``
building ``eva_giant_patch14_*`` / ``eva02_*_clip_*``); timm is not importable in this
environment, so this is a from-scratch implementation of timm's published Eva
architecture (timm ``models/eva.py`` + ``layers/pos_embed_sincos.py``):

- EVA01-giant: plain pre-LN ViT blocks with the fused-qkv bias trick (learned q/v
  biases, zero k bias), GELU MLP, learnable abs pos embed, final LN -> cls token ->
  linear head (the head IS the CLIP projection: the open_clip configs set
  ``timm_proj: null``).
- EVA02 (base/large): separate q/k/v projections (k without bias), SwiGLU MLP with an
  inner LayerNorm (``scale_mlp``), and 2D axial rotary embeddings on q/k patch tokens
  (cls excluded), built exactly like timm's ``RotaryEmbeddingCat`` (interleaved pairs,
  sin||cos concatenated, ``ref_feat_shape`` coordinate rescaling).
- EVA02-enormous: EVA01-style internals at depth 64 (fused qkv, plain MLP, no rope).

Blocks are scan-stacked like the other towers (models/blocks.py rationale). The depth
loop runs under ``lax.scan``; rope tables are static numpy constants baked at trace
time.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPVisionCfg, to_2tuple
from ..ops.attention import dot_product_attention
from ..ops.layers import gelu, layer_norm, linear
from . import blocks as B
from .htsat import _trunc_normal


class EvaCfg(NamedTuple):
    dim: int
    depth: int
    heads: int
    patch: int
    mlp_hidden: int
    swiglu: bool
    fused_qkv: bool
    rope: bool
    scale_mlp: bool
    image_size: int
    ref_feat_shape: Optional[Tuple[int, int]] = None
    norm_eps: float = 1e-6
    pool: str = "tok"  # "tok" (cls token) | "map" (AttentionPoolLatent — PE-Core)


def _eva02_hidden(dim: int) -> int:
    # timm: mlp_ratio = 4 * 2/3, hidden rounded to a multiple of 32 (EVA02 paper)
    return int(round(dim * 4 * 2 / 3 / 32) * 32)


EVA_CONFIGS = {
    # timm eva.py default_cfgs / model entrypoints
    "eva_giant_patch14_224": EvaCfg(1408, 40, 16, 14, 6144, False, True, False, False, 224),
    "eva_giant_patch14_336": EvaCfg(1408, 40, 16, 14, 6144, False, True, False, False, 336),
    "eva02_base_patch16_clip_224": EvaCfg(
        768, 12, 12, 16, _eva02_hidden(768), True, False, True, True, 224, (16, 16)),
    "eva02_large_patch14_clip_224": EvaCfg(
        1024, 24, 16, 14, _eva02_hidden(1024), True, False, True, True, 224, (16, 16)),
    "eva02_large_patch14_clip_336": EvaCfg(
        1024, 24, 16, 14, _eva02_hidden(1024), True, False, True, True, 336, (16, 16)),
    "eva02_enormous_patch14_clip_224": EvaCfg(
        1792, 64, 16, 14, 15360, False, True, False, False, 224),
    # Meta Perception Encoder core towers (reference PE-Core-*.json; timm implements
    # these on its Eva class: fused qkv, 2D rope, GELU MLP, attention-pool head).
    # Widths/depths follow the PE paper's T/S/B/L/G table (G ~1.9B params).
    "vit_pe_core_tiny_patch16_384": EvaCfg(
        192, 12, 3, 16, 768, False, True, True, False, 384, pool="map"),
    "vit_pe_core_small_patch16_384": EvaCfg(
        384, 12, 6, 16, 1536, False, True, True, False, 384, pool="map"),
    "vit_pe_core_base_patch16_224": EvaCfg(
        768, 12, 12, 16, 3072, False, True, True, False, 224, pool="map"),
    "vit_pe_core_large_patch14_336": EvaCfg(
        1024, 24, 16, 14, 4096, False, True, True, False, 336, pool="map"),
    "vit_pe_core_gigantic_patch14_448": EvaCfg(
        1536, 50, 16, 14, 8960, False, True, True, False, 448, pool="map"),
}


def is_eva(vision_cfg) -> bool:
    name = vision_cfg.timm_model_name or ""
    return name.startswith(("eva_", "eva02_", "vit_pe_core_"))


def resolve_eva_cfg(vision_cfg: CLIPVisionCfg) -> EvaCfg:
    name = vision_cfg.timm_model_name
    if name not in EVA_CONFIGS:
        raise NotImplementedError(f"EVA variant {name!r} has no native TPU config yet")
    ecfg = EVA_CONFIGS[name]
    img = vision_cfg.image_size if isinstance(vision_cfg.image_size, int) else ecfg.image_size
    return ecfg._replace(image_size=img or ecfg.image_size)


# ---------------------------------------------------------------------------
# rope (timm RotaryEmbeddingCat construction)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def rope_table(gh: int, gw: int, head_dim: int,
               ref: Optional[Tuple[int, int]], temperature: float = 10000.0) -> np.ndarray:
    """(gh*gw, 2*head_dim) sin||cos table: per position, interleaved-pair frequencies,
    y-axis bands then x-axis bands (timm build_rotary_pos_embed with in_pixels=False)."""
    n_bands = head_dim // 4
    bands = 1.0 / (temperature ** (np.arange(n_bands, dtype=np.float64) / n_bands))
    ty, tx = np.meshgrid(np.arange(gh, dtype=np.float64),
                         np.arange(gw, dtype=np.float64), indexing="ij")
    if ref is not None:
        ty = ty / gh * ref[0]
        tx = tx / gw * ref[1]
    t = np.stack([ty.reshape(-1), tx.reshape(-1)], axis=-1)  # (N, 2)
    grid = t[:, :, None] * bands[None, None, :]  # (N, 2, n_bands)
    grid = grid.reshape(-1, 2 * n_bands)
    grid = np.repeat(grid, 2, axis=-1)  # interleave pairs -> (N, head_dim)
    return np.concatenate([np.sin(grid), np.cos(grid)], axis=-1).astype(np.float32)


def apply_rope(x: jax.Array, table: jax.Array) -> jax.Array:
    """x (B, N, H, hd) patch tokens; table (N, 2*hd). x*cos + rot(x)*sin with
    interleaved-pair rotation (timm apply_rot_embed_cat / rot)."""
    hd = x.shape[-1]
    sin = table[:, :hd][None, :, None, :].astype(jnp.float32)
    cos = table[:, hd:][None, :, None, :].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    x2 = xf.reshape(*xf.shape[:-1], hd // 2, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1).reshape(xf.shape)
    return (xf * cos + rot * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_block(key, ecfg: EvaCfg) -> Dict[str, Any]:
    dim, hidden = ecfg.dim, ecfg.mlp_hidden
    ks = jax.random.split(key, 8)
    p: Dict[str, Any] = {"norm1": B._ln_params(dim), "norm2": B._ln_params(dim)}
    if ecfg.fused_qkv:
        p["attn"] = {
            "qkv": {"kernel": _trunc_normal(ks[0], (dim, 3 * dim))},
            "q_bias": jnp.zeros((dim,)),
            "v_bias": jnp.zeros((dim,)),
            "proj": B.torch_linear_init(ks[1], dim, dim),
        }
    else:
        p["attn"] = {
            "q": B.torch_linear_init(ks[0], dim, dim),
            "k": B.torch_linear_init(jax.random.fold_in(ks[0], 1), dim, dim, bias=False),
            "v": B.torch_linear_init(jax.random.fold_in(ks[0], 2), dim, dim),
            "proj": B.torch_linear_init(ks[1], dim, dim),
        }
    if ecfg.swiglu:
        mlp = {
            "fc1_g": B.torch_linear_init(ks[2], dim, hidden),
            "fc1_x": B.torch_linear_init(ks[3], dim, hidden),
            "fc2": B.torch_linear_init(ks[4], hidden, dim),
        }
        if ecfg.scale_mlp:
            mlp["norm"] = B._ln_params(hidden)
        p["mlp"] = mlp
    else:
        p["mlp"] = {
            "fc1": B.torch_linear_init(ks[2], dim, hidden),
            "fc2": B.torch_linear_init(ks[4], hidden, dim),
        }
    return p


def init_eva(key, vision_cfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    ecfg = resolve_eva_cfg(vision_cfg)
    gh = gw = ecfg.image_size // ecfg.patch
    ks = jax.random.split(key, 6)
    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": _trunc_normal(ks[0], (ecfg.patch * ecfg.patch * 3, ecfg.dim)),
            "bias": jnp.zeros((ecfg.dim,)),
        },
        "cls_token": B.normal_init(ks[1], (ecfg.dim,), 0.02),
        "pos_embed": B.normal_init(ks[2], (gh * gw + 1, ecfg.dim), 0.02),
        "norm": B._ln_params(ecfg.dim),
        "head": B.torch_linear_init(ks[3], ecfg.dim, embed_dim),
    }
    if ecfg.pool == "map":
        kp = jax.random.split(ks[5], 5)
        dim = ecfg.dim
        hidden = int(dim * 4.0)
        p["attn_pool"] = {
            "latent": B.normal_init(kp[0], (dim,), 0.02),
            "q": B.torch_linear_init(kp[1], dim, dim),
            "kv": B.torch_linear_init(kp[2], dim, 2 * dim),
            "proj": B.torch_linear_init(kp[3], dim, dim),
            "norm": B._ln_params(dim),
            "mlp": {
                "c_fc": B.torch_linear_init(jax.random.fold_in(kp[4], 0), dim, hidden),
                "c_proj": B.torch_linear_init(jax.random.fold_in(kp[4], 1), hidden, dim),
            },
        }
    bkeys = jax.random.split(ks[4], ecfg.depth)
    p["blocks"] = jax.vmap(lambda k: _init_block(k, ecfg))(bkeys)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _eva_attention(p: Dict[str, Any], x: jax.Array, *, heads: int,
                   rope: Optional[jax.Array]) -> jax.Array:
    b, l, d = x.shape
    hd = d // heads
    if "qkv" in p:
        qkv = jnp.dot(x, p["qkv"]["kernel"].astype(x.dtype))
        bias = jnp.concatenate([
            p["q_bias"], jnp.zeros_like(p["q_bias"]), p["v_bias"]]).astype(qkv.dtype)
        qkv = qkv + bias
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = linear(x, p["q"]["kernel"], p["q"].get("bias"))
        k = linear(x, p["k"]["kernel"], p["k"].get("bias"))
        v = linear(x, p["v"]["kernel"], p["v"].get("bias"))
    q = q.reshape(b, l, heads, hd)
    k = k.reshape(b, l, heads, hd)
    v = v.reshape(b, l, heads, hd)
    if rope is not None:
        # rotary on patch tokens only, cls passes through (timm eva.py forward)
        q = jnp.concatenate([q[:, :1], apply_rope(q[:, 1:], rope)], axis=1)
        k = jnp.concatenate([k[:, :1], apply_rope(k[:, 1:], rope)], axis=1)
    out = dot_product_attention(q, k, v)
    out = out.reshape(b, l, d)
    return linear(out, p["proj"]["kernel"], p["proj"].get("bias"))


def _eva_mlp(p: Dict[str, Any], x: jax.Array, *, eps: float) -> jax.Array:
    if "fc1_g" in p:
        g = linear(x, p["fc1_g"]["kernel"], p["fc1_g"].get("bias"))
        h = linear(x, p["fc1_x"]["kernel"], p["fc1_x"].get("bias"))
        h = jax.nn.silu(g) * h
        if "norm" in p:
            h = layer_norm(h, p["norm"]["scale"], p["norm"]["bias"], eps=eps)
        return linear(h, p["fc2"]["kernel"], p["fc2"].get("bias"))
    h = gelu(linear(x, p["fc1"]["kernel"], p["fc1"].get("bias")))
    return linear(h, p["fc2"]["kernel"], p["fc2"].get("bias"))


def apply_eva(
    params: Dict[str, Any],
    vision_cfg: CLIPVisionCfg,
    x: jax.Array,  # (B, H, W, 3) normalized NHWC
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    from .vit import patchify

    ecfg = resolve_eva_cfg(vision_cfg)
    eps = ecfg.norm_eps
    gh = gw = ecfg.image_size // ecfg.patch
    hd = ecfg.dim // ecfg.heads

    x = x.astype(compute_dtype)
    x = patchify(x, ecfg.patch)
    x = jnp.dot(x, params["patch_embed"]["kernel"].astype(compute_dtype))
    x = x + params["patch_embed"]["bias"].astype(x.dtype)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype)[None, None],
                           (x.shape[0], 1, ecfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)

    rope = jnp.asarray(rope_table(gh, gw, hd, ecfg.ref_feat_shape)) if ecfg.rope else None

    def body(carry, bp):
        h = layer_norm(carry, bp["norm1"]["scale"], bp["norm1"]["bias"], eps=eps)
        h = _eva_attention(bp["attn"], h, heads=ecfg.heads, rope=rope)
        carry = carry + h
        h = layer_norm(carry, bp["norm2"]["scale"], bp["norm2"]["bias"], eps=eps)
        h = _eva_mlp(bp["mlp"], h, eps=eps)
        return carry + h, None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False, policy=B.remat_policy())
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=B.scan_unroll())

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=eps)
    if ecfg.pool == "map":
        from .naflex_vit import _apply_map_pool

        valid = jnp.ones(x.shape[:2], dtype=bool)
        pooled = _apply_map_pool(params["attn_pool"], x, valid,
                                 heads=ecfg.heads, eps=eps, act="gelu")
    else:
        pooled = x[:, 0]
    return linear(pooled, params["head"]["kernel"], params["head"].get("bias"))


# ---------------------------------------------------------------------------
# converter (timm eva trunk state dict, keys under visual.trunk.*)
# ---------------------------------------------------------------------------

def timm_eva_to_params(sd: Dict[str, Any], vision_cfg: CLIPVisionCfg) -> Dict[str, Any]:
    """timm Eva trunk keys -> param tree. Accepts keys already stripped of the
    ``visual.trunk.`` prefix (reference timm checkpoints nest the trunk there)."""
    from ..convert import _np

    ecfg = resolve_eva_cfg(vision_cfg)
    pw = _np(sd["patch_embed.proj.weight"])  # (dim, 3, p, p)
    tree: Dict[str, Any] = {
        "patch_embed": {
            # conv OIHW -> flattened (p*p*3, dim) matching vit.patchify layout (p, p, 3)
            "kernel": pw.transpose(2, 3, 1, 0).reshape(-1, pw.shape[0]),
            "bias": _np(sd["patch_embed.proj.bias"]),
        },
        "cls_token": _np(sd["cls_token"]).reshape(-1),
        "pos_embed": _np(sd["pos_embed"])[0],
        "norm": {"scale": _np(sd["norm.weight"]), "bias": _np(sd["norm.bias"])},
        "head": {"kernel": _np(sd["head.weight"]).T, "bias": _np(sd["head.bias"])},
    }
    if "attn_pool.latent" in sd:
        tree["attn_pool"] = {
            "latent": _np(sd["attn_pool.latent"]).reshape(-1),
            "q": {"kernel": _np(sd["attn_pool.q.weight"]).T,
                  "bias": _np(sd["attn_pool.q.bias"])},
            "kv": {"kernel": _np(sd["attn_pool.kv.weight"]).T,
                   "bias": _np(sd["attn_pool.kv.bias"])},
            "proj": {"kernel": _np(sd["attn_pool.proj.weight"]).T,
                     "bias": _np(sd["attn_pool.proj.bias"])},
            "norm": {"scale": _np(sd["attn_pool.norm.weight"]),
                     "bias": _np(sd["attn_pool.norm.bias"])},
            "mlp": {
                "c_fc": {"kernel": _np(sd["attn_pool.mlp.fc1.weight"]).T,
                         "bias": _np(sd["attn_pool.mlp.fc1.bias"])},
                "c_proj": {"kernel": _np(sd["attn_pool.mlp.fc2.weight"]).T,
                           "bias": _np(sd["attn_pool.mlp.fc2.bias"])},
            },
        }

    blocks = []
    for i in range(ecfg.depth):
        pre = f"blocks.{i}."
        bp: Dict[str, Any] = {
            "norm1": {"scale": _np(sd[pre + "norm1.weight"]), "bias": _np(sd[pre + "norm1.bias"])},
            "norm2": {"scale": _np(sd[pre + "norm2.weight"]), "bias": _np(sd[pre + "norm2.bias"])},
        }
        if ecfg.fused_qkv:
            bp["attn"] = {
                "qkv": {"kernel": _np(sd[pre + "attn.qkv.weight"]).T},
                "q_bias": _np(sd[pre + "attn.q_bias"]),
                "v_bias": _np(sd[pre + "attn.v_bias"]),
                "proj": {"kernel": _np(sd[pre + "attn.proj.weight"]).T,
                         "bias": _np(sd[pre + "attn.proj.bias"])},
            }
        else:
            bp["attn"] = {
                "q": {"kernel": _np(sd[pre + "attn.q_proj.weight"]).T,
                      "bias": _np(sd[pre + "attn.q_proj.bias"])},
                "k": {"kernel": _np(sd[pre + "attn.k_proj.weight"]).T},
                "v": {"kernel": _np(sd[pre + "attn.v_proj.weight"]).T,
                      "bias": _np(sd[pre + "attn.v_proj.bias"])},
                "proj": {"kernel": _np(sd[pre + "attn.proj.weight"]).T,
                         "bias": _np(sd[pre + "attn.proj.bias"])},
            }
        if ecfg.swiglu:
            mlp = {
                "fc1_g": {"kernel": _np(sd[pre + "mlp.fc1_g.weight"]).T,
                          "bias": _np(sd[pre + "mlp.fc1_g.bias"])},
                "fc1_x": {"kernel": _np(sd[pre + "mlp.fc1_x.weight"]).T,
                          "bias": _np(sd[pre + "mlp.fc1_x.bias"])},
                "fc2": {"kernel": _np(sd[pre + "mlp.fc2.weight"]).T,
                        "bias": _np(sd[pre + "mlp.fc2.bias"])},
            }
            if ecfg.scale_mlp:
                mlp["norm"] = {"scale": _np(sd[pre + "mlp.norm.weight"]),
                               "bias": _np(sd[pre + "mlp.norm.bias"])}
            bp["mlp"] = mlp
        else:
            bp["mlp"] = {
                "fc1": {"kernel": _np(sd[pre + "mlp.fc1.weight"]).T,
                        "bias": _np(sd[pre + "mlp.fc1.bias"])},
                "fc2": {"kernel": _np(sd[pre + "mlp.fc2.weight"]).T,
                        "bias": _np(sd[pre + "mlp.fc2.bias"])},
            }
        blocks.append(bp)
    tree["blocks"] = jax.tree.map(lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *blocks)
    return jax.tree.map(jnp.asarray, tree)
