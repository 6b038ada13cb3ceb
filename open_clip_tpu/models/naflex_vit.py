"""NaFlex variable-resolution ViT — native TPU implementation.

The reference outsources this tower to timm's ``NaFlexVit`` (reference
``src/open_clip/model.py:171-248`` timm path, ``naflex_convert.py``); here it is a
native JAX tower honoring the same data contract:

    {"patches":     (B, N, P*P*3)  float — flattened patch pixels,
     "patch_coord": (B, N, 2)      int   — (y, x) patch-grid coordinates,
     "patch_valid": (B, N)         bool  — padding mask}

Variable resolution maps perfectly onto XLA: every (seq_len, batch) bucket is one
static shape (the NaFlex token-budget batching of reference ``naflex_data.py``), and
padding is handled by a key-valid attention bias + masked pooling.

Components: linear patch embed; learned 2-D pos-embed grid bilinearly sampled at
fractional patch coordinates (functionally the resize-then-gather of timm's
interpolation); optional class token; stacked scanned blocks (models/blocks.py);
masked GAP or a MAP attention-pool latent head (timm ``AttentionPoolLatent`` shape).

Checkpoint import from native OpenCLIP ViTs follows the reference's conversion recipe
(naflex_convert.py:157-212): cls_token folds in pos_embed[0], the patch conv flattens
to the linear proj.
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CLIPVisionCfg
from ..ops.layers import ACT_FNS, layer_norm, linear
from . import blocks as B

NEG_INF = jnp.finfo(jnp.float32).min

_SIZES = {
    # width, layers, heads
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "medium": (512, 12, 8),
    "betwixt": (640, 12, 10),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "so150m": (880, 18, 13),  # shape-optimized 150M family (timm naming)
    "so150m2": (832, 21, 13),  # verified vs reference naflexgenlip_so150m2.json dims
    "so400m": (1152, 27, 16),
}


@dataclass
class NaFlexVitCfg:
    width: int = 768
    layers: int = 12
    heads: int = 12
    patch_size: int = 16
    mlp_ratio: float = 4.0
    pos_grid: Tuple[int, int] = (16, 16)
    pool: str = "map"  # map | avg | tok
    class_token: bool = False
    swiglu_mlp: bool = False
    attn_pool_mlp_ratio: float = 4.0
    reg_tokens: int = 0
    norm_eps: float = 1e-6
    ls_init_value: Optional[float] = None
    proj_bias: bool = True
    # timm naflexvit defaults to NO pre-block norm (norm_pre = Identity); only
    # native-ViT-converted configs carry one (reference naflex_convert.py:101 sets
    # pre_norm=True exactly because native CLIP ViTs have ln_pre)
    pre_norm: bool = False


def parse_naflex_cfg(vision_cfg: CLIPVisionCfg) -> NaFlexVitCfg:
    """Derive the native NaFlex config from the reference's timm-model-name scheme
    (``naflexvit_<size>_patch<P>_<pool>`` + timm_model_kwargs overrides)."""
    name = vision_cfg.timm_model_name or "naflexvit_base_patch16_map"
    m = re.match(r"naflexvit_([a-z0-9]+)_patch(\d+)_(\w+)", name)
    if not m:
        raise ValueError(f"cannot parse naflex model name {name!r}")
    size, patch, tail = m.group(1), int(m.group(2)), m.group(3)
    if size not in _SIZES:
        raise ValueError(f"unknown naflex size {size!r}; known: {sorted(_SIZES)}")
    width, layers, heads = _SIZES[size]
    pool = "map" if "map" in tail else ("avg" if "gap" in tail else "tok")
    reg = re.search(r"reg(\d+)", tail)
    kw = dict(vision_cfg.timm_model_kwargs or {})
    cfg = NaFlexVitCfg(
        # timm_model_kwargs may override the named size (the reference's
        # moderntext-naflex_ViT-B-deep-16 passes depth/embed_dim/num_heads)
        width=kw.get("embed_dim", width),
        layers=kw.get("depth", layers),
        heads=kw.get("num_heads", heads),
        patch_size=kw.get("patch_size", patch),
        mlp_ratio=kw.get("mlp_ratio", 4.0),
        pos_grid=tuple(kw.get("pos_embed_grid_size", (16, 16))),
        pool=vision_cfg.timm_pool or pool,
        swiglu_mlp=kw.get("swiglu_mlp", False),
        attn_pool_mlp_ratio=kw.get("attn_pool_mlp_ratio", 4.0),
        reg_tokens=kw.get("reg_tokens", int(reg.group(1)) if reg else 0),
        class_token=kw.get("class_token", False),
        pre_norm=kw.get("pre_norm", False),
    )
    return cfg


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_naflex_vit(key, cfg: NaFlexVitCfg, embed_dim: int) -> Dict[str, Any]:
    width = cfg.width
    pdim = cfg.patch_size * cfg.patch_size * 3
    ks = jax.random.split(key, 10)
    scale = width ** -0.5

    p: Dict[str, Any] = {
        "patch_embed": {
            "kernel": B.normal_init(ks[0], (pdim, width), scale),
            "bias": jnp.zeros((width,)),
        },
        "pos_embed": B.normal_init(ks[1], (*cfg.pos_grid, width), 0.02),
        "norm": B._ln_params(width),
    }
    if cfg.pre_norm:
        p["norm_pre"] = B._ln_params(width)
    if cfg.class_token:
        p["cls_token"] = B.normal_init(ks[2], (width,), 1e-6)
    if cfg.reg_tokens:
        p["reg_tokens"] = B.normal_init(jax.random.fold_in(ks[2], 7), (cfg.reg_tokens, width), 1e-6)

    if cfg.swiglu_mlp:
        # swiglu blocks need a dedicated stack layout; reuse modern-text style mlp
        p["blocks"] = _init_swiglu_blocks(ks[3], cfg)
    else:
        p["blocks"] = B.init_block_stack(
            ks[3], cfg.layers, width, cfg.heads, int(width * cfg.mlp_ratio),
            ls_init_value=cfg.ls_init_value, init_scheme="vision",
        )

    if cfg.pool == "map":
        kp = jax.random.split(ks[4], 5)
        hidden = int(width * cfg.attn_pool_mlp_ratio)
        p["attn_pool"] = {
            "latent": B.normal_init(kp[0], (width,), scale),
            "q": B.torch_linear_init(kp[1], width, width),
            "kv": B.torch_linear_init(kp[2], width, 2 * width),
            "proj": B.torch_linear_init(kp[3], width, width),
            "norm": B._ln_params(width),
            "mlp": {
                "c_fc": B.torch_linear_init(jax.random.fold_in(kp[4], 0), width, hidden),
                "c_proj": B.torch_linear_init(jax.random.fold_in(kp[4], 1), hidden, width),
            },
        }

    head = {"kernel": B.normal_init(ks[5], (width, embed_dim), scale)}
    if cfg.proj_bias:
        head["bias"] = jnp.zeros((embed_dim,))
    p["head"] = head
    return p


def _init_swiglu_blocks(key, cfg: NaFlexVitCfg):
    width, heads = cfg.width, cfg.heads
    hidden = int(width * cfg.mlp_ratio)

    def init_one(k):
        ks = jax.random.split(k, 4)
        return {
            "ln_1": B._ln_params(width),
            "attn": {
                "qkv": {"kernel": B.xavier_uniform(ks[0], (width, 3 * width)), "bias": jnp.zeros((3 * width,))},
                "out": B.torch_linear_init(ks[1], width, width),
            },
            "ln_2": B._ln_params(width),
            "mlp": {
                "w12": B.torch_linear_init(ks[2], width, 2 * hidden),
                "w3": B.torch_linear_init(ks[3], hidden, width),
            },
        }

    return jax.vmap(init_one)(jax.random.split(key, cfg.layers))


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def sample_pos_embed(grid: jax.Array, coords: jax.Array, valid: jax.Array) -> jax.Array:
    """Bilinearly sample the learned (gh, gw, W) grid at per-sample fractional positions.

    ``coords`` are integer patch-grid coordinates; each sample's extent is its max valid
    coordinate + 1, so the grid stretches to that sample's aspect ratio — equivalent to
    timm's resize-to-target-grid + gather, without dynamic shapes.
    """
    gh, gw, width = grid.shape
    cy = coords[..., 0].astype(jnp.float32)
    cx = coords[..., 1].astype(jnp.float32)
    h_ext = jnp.max(jnp.where(valid, cy, 0.0), axis=1, keepdims=True) + 1.0  # (B,1)
    w_ext = jnp.max(jnp.where(valid, cx, 0.0), axis=1, keepdims=True) + 1.0

    # map patch centers onto grid coordinates (align_corners=False convention)
    fy = (cy + 0.5) / h_ext * gh - 0.5
    fx = (cx + 0.5) / w_ext * gw - 0.5
    y0 = jnp.clip(jnp.floor(fy), 0, gh - 1)
    x0 = jnp.clip(jnp.floor(fx), 0, gw - 1)
    y1 = jnp.clip(y0 + 1, 0, gh - 1)
    x1 = jnp.clip(x0 + 1, 0, gw - 1)
    wy = jnp.clip(fy - y0, 0.0, 1.0)[..., None]
    wx = jnp.clip(fx - x0, 0.0, 1.0)[..., None]

    flat = grid.reshape(gh * gw, width)

    def gather(yy, xx):
        idx = (yy * gw + xx).astype(jnp.int32)
        return flat[idx]

    g00 = gather(y0, x0)
    g01 = gather(y0, x1)
    g10 = gather(y1, x0)
    g11 = gather(y1, x1)
    top = g00 * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy  # (B, N, W)


def _apply_swiglu_block(p, x, *, heads, key_valid, eps):
    from ..ops.attention import multi_head_attention

    h = layer_norm(x, p["ln_1"]["scale"], p["ln_1"]["bias"], eps=eps)
    h = multi_head_attention(p["attn"], h, num_heads=heads, key_valid=key_valid)
    x = x + h
    h = layer_norm(x, p["ln_2"]["scale"], p["ln_2"]["bias"], eps=eps)
    h12 = linear(h, p["mlp"]["w12"]["kernel"], p["mlp"]["w12"].get("bias"))
    u, g = jnp.split(h12, 2, axis=-1)
    h = linear(u * jax.nn.silu(g), p["mlp"]["w3"]["kernel"], p["mlp"]["w3"].get("bias"))
    return x + h


def apply_naflex_vit(
    params: Dict[str, Any],
    cfg: NaFlexVitCfg,
    batch: Dict[str, jax.Array],
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
    act: str = "gelu",
) -> Tuple[jax.Array, jax.Array]:
    """patch dict -> (pooled (B, embed_dim), tokens (B, N, W))."""
    eps = cfg.norm_eps
    patches = batch["patches"].astype(compute_dtype)
    coords = batch["patch_coord"]
    valid = batch["patch_valid"].astype(bool)
    b, n, _ = patches.shape

    x = linear(patches, params["patch_embed"]["kernel"], params["patch_embed"].get("bias"))
    pos = sample_pos_embed(params["pos_embed"].astype(jnp.float32), coords, valid)
    x = x + pos.astype(compute_dtype)

    num_prefix = 0
    key_valid = valid
    if "reg_tokens" in params:
        regs = jnp.broadcast_to(params["reg_tokens"].astype(compute_dtype)[None],
                                (b,) + params["reg_tokens"].shape)
        x = jnp.concatenate([regs, x], axis=1)
        key_valid = jnp.concatenate([jnp.ones((b, regs.shape[1]), bool), key_valid], axis=1)
        num_prefix += regs.shape[1]
    if "cls_token" in params:
        cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype)[None, None], (b, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        key_valid = jnp.concatenate([jnp.ones((b, 1), bool), key_valid], axis=1)
        num_prefix += 1

    if "norm_pre" in params:
        x = layer_norm(x, params["norm_pre"]["scale"], params["norm_pre"]["bias"], eps=eps)

    # key padding rides as a (B, L) validity vector so the flash kernel can mask
    # in-kernel at long bucket lengths; the xla path folds it into a bias itself
    if cfg.swiglu_mlp:
        def body(carry, p):
            return _apply_swiglu_block(p, carry, heads=cfg.heads, key_valid=key_valid,
                                       eps=eps), None

        if remat:
            body = jax.checkpoint(body, prevent_cse=False)
        x, _ = jax.lax.scan(body, x, params["blocks"], unroll=B.scan_unroll())
    else:
        x = B.apply_transformer(
            params["blocks"], x, heads=cfg.heads, act=act, key_valid=key_valid,
            norm_eps=eps, remat=remat,
        )

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"], eps=eps)
    tokens = x[:, num_prefix:]

    if cfg.pool == "map":
        pooled = _apply_map_pool(params["attn_pool"], tokens, valid, heads=cfg.heads, eps=eps, act=act)
    elif cfg.pool == "avg":
        w = valid.astype(jnp.float32)[..., None]
        pooled = ((tokens.astype(jnp.float32) * w).sum(1) / jnp.maximum(w.sum(1), 1.0)).astype(tokens.dtype)
    else:  # tok
        pooled = x[:, 0]

    pooled = linear(pooled, params["head"]["kernel"], params["head"].get("bias"))
    return pooled, tokens


def _apply_map_pool(p, x, valid, *, heads, eps, act):
    """timm AttentionPoolLatent shape: latent query -> masked attention -> proj ->
    residual MLP."""
    from ..ops.attention import dot_product_attention

    b, n, width = x.shape
    hd = width // heads
    latent = jnp.broadcast_to(p["latent"].astype(x.dtype)[None, None], (b, 1, width))
    q = linear(latent, p["q"]["kernel"], p["q"].get("bias")).reshape(b, 1, heads, hd)
    kv = linear(x, p["kv"]["kernel"], p["kv"].get("bias"))
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(b, n, heads, hd)
    v = v.reshape(b, n, heads, hd)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]
    out = dot_product_attention(q, k, v, bias=bias, impl="xla").reshape(b, 1, width)
    out = linear(out, p["proj"]["kernel"], p["proj"].get("bias"))
    h = layer_norm(out, p["norm"]["scale"], p["norm"]["bias"], eps=eps)
    h = linear(h, p["mlp"]["c_fc"]["kernel"], p["mlp"]["c_fc"].get("bias"))
    h = ACT_FNS[act](h)
    h = linear(h, p["mlp"]["c_proj"]["kernel"], p["mlp"]["c_proj"].get("bias"))
    out = out + h
    return out[:, 0]


# ---------------------------------------------------------------------------
# conversion from a native OpenCLIP ViT (reference naflex_convert.py:157-212)
# ---------------------------------------------------------------------------

def vit_params_to_naflex(vit_params: Dict[str, Any], grid: Tuple[int, int]) -> Dict[str, Any]:
    """Fold a standard ViT param tree into the NaFlex layout: cls_token absorbs
    pos_embed[0]; the flattened conv kernel is already the linear proj here."""
    import numpy as np

    pe = np.asarray(vit_params["positional_embedding"])
    width = pe.shape[-1]
    out: Dict[str, Any] = {
        "patch_embed": {
            "kernel": vit_params["patch_embed"]["kernel"],
            "bias": jnp.zeros((width,)),
        },
        "cls_token": jnp.asarray(np.asarray(vit_params["class_embedding"]) + pe[0]),
        "pos_embed": jnp.asarray(pe[1:].reshape(grid[0], grid[1], width)),
        "norm_pre": vit_params["ln_pre"],
        "blocks": vit_params["blocks"],
        "norm": vit_params["ln_post"],
        "head": {"kernel": vit_params["proj"]},
    }
    return out
