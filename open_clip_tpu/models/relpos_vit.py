"""Relative-position ViT image tower (timm ``vit_relpos_medium_patch16_cls_224``).

The reference serves this tower through timm
(``model_configs/vit_relpos_medium_patch16_cls_224.json`` -> timm_model.py:25).
Native re-design: a standard pre-norm ViT trunk with NO absolute position
embedding; instead every block's attention adds a relative-position bias produced
by a small MLP over log-spaced relative grid coordinates (timm
``vision_transformer_relpos.py`` / ``RelPosMlp``, the Swin-v2-style
log-coordinate parameterization). The class token attends with zero relative
bias (timm ``mode='cls'``).

timm is not installed in this environment and no pretrained (model, tag) pair
exists for this config, so coverage is structural (shapes, bias symmetry,
trainability) rather than checkpoint-level; the MLP-bias math follows the timm
source as spec.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPVisionCfg, to_2tuple
from ..ops.layers import gelu, layer_norm, linear
from . import blocks as B

RELPOS_CONFIGS: Dict[str, Dict[str, Any]] = {
    "vit_relpos_medium_patch16_cls_224": dict(
        patch_size=16, width=512, depth=12, heads=8, mlp_ratio=4.0,
        class_token=True, hidden_dim=512,
    ),
    "vit_relpos_base_patch16_cls_224": dict(
        patch_size=16, width=768, depth=12, heads=12, mlp_ratio=4.0,
        class_token=True, hidden_dim=768,
    ),
}


def is_relpos_vit(vision_cfg: CLIPVisionCfg) -> bool:
    return (vision_cfg.timm_model_name or "").startswith("vit_relpos")


def _cfg(vision_cfg: CLIPVisionCfg) -> Dict[str, Any]:
    name = vision_cfg.timm_model_name
    if name not in RELPOS_CONFIGS:
        raise NotImplementedError(f"vit_relpos variant {name!r} has no native TPU config yet")
    return RELPOS_CONFIGS[name]


@functools.lru_cache(maxsize=8)
def _rel_log_coords(gh: int, gw: int) -> np.ndarray:
    """(N, N, 2) log-spaced relative coordinates (timm gen_relative_log_coords,
    mode='cls': sign(d) * log1p(|d|))."""
    yy, xx = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    coords = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=-1).astype(np.float32)  # (N, 2)
    rel = coords[:, None, :] - coords[None, :, :]  # (N, N, 2)
    return np.sign(rel) * np.log1p(np.abs(rel))


def _init_block(key, dim: int, heads: int, mlp_ratio: float, hidden_dim: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 7)
    hidden = int(dim * mlp_ratio)

    def tn(k, shape, std=0.02):
        return jnp.clip(jax.random.normal(k, shape) * std, -2 * std, 2 * std)

    return {
        "norm1": B._ln_params(dim),
        "attn": {
            "qkv": {"kernel": tn(ks[0], (dim, 3 * dim)), "bias": jnp.zeros((3 * dim,))},
            "proj": {"kernel": tn(ks[1], (dim, dim)), "bias": jnp.zeros((dim,))},
            "rel_mlp": {
                "fc1": {"kernel": tn(ks[2], (2, hidden_dim), std=0.1),
                        "bias": jnp.zeros((hidden_dim,))},
                "fc2": {"kernel": tn(ks[3], (hidden_dim, heads), std=0.1),
                        "bias": jnp.zeros((heads,))},
            },
        },
        "norm2": B._ln_params(dim),
        "mlp": {
            "fc1": {"kernel": tn(ks[4], (dim, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": tn(ks[5], (hidden, dim)), "bias": jnp.zeros((dim,))},
        },
    }


def init_relpos_vit(key, vision_cfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    rc = _cfg(vision_cfg)
    dim = rc["width"]
    ks = jax.random.split(key, rc["depth"] + 3)
    p: Dict[str, Any] = {
        "patch_embed": {
            "proj": {"kernel": jnp.clip(jax.random.normal(
                ks[0], (rc["patch_size"], rc["patch_size"], 3, dim)) * 0.02, -0.04, 0.04),
                "bias": jnp.zeros((dim,))},
        },
        "cls_token": jnp.zeros((dim,)) if rc["class_token"] else None,
        "blocks": [_init_block(ks[1 + i], dim, rc["heads"], rc["mlp_ratio"], rc["hidden_dim"])
                   for i in range(rc["depth"])],
        "norm": B._ln_params(dim),
        "head": {"proj": {"kernel": jnp.clip(jax.random.normal(
            ks[-1], (dim, embed_dim)) * dim ** -0.5, -0.1, 0.1)}},
    }
    if p["cls_token"] is None:
        del p["cls_token"]
    return p


def _rel_bias(attn_p, coords: jax.Array, heads: int, num_prefix: int) -> jax.Array:
    """(heads, P+N, P+N) bias: MLP(log-coords) for patch pairs, zero for the class
    token's row/column (timm RelPosMlp mode='cls')."""
    h = linear(coords, attn_p["rel_mlp"]["fc1"]["kernel"], attn_p["rel_mlp"]["fc1"].get("bias"))
    h = jax.nn.relu(h)
    # timm RelPosMlp builds its Mlp with bias=(True, False): fc2 has no bias in
    # real checkpoints (seed-inits here carry a zero bias, which is equivalent)
    bias = linear(h, attn_p["rel_mlp"]["fc2"]["kernel"], attn_p["rel_mlp"]["fc2"].get("bias"))
    bias = bias.transpose(2, 0, 1)  # (heads, N, N)
    if num_prefix:
        n = bias.shape[-1]
        bias = jnp.pad(bias, ((0, 0), (num_prefix, 0), (num_prefix, 0)))
        assert bias.shape[-1] == n + num_prefix
    return bias


def apply_relpos_vit(
    params: Dict[str, Any],
    vision_cfg: CLIPVisionCfg,
    image: jax.Array,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    rc = _cfg(vision_cfg)
    ih, iw = to_2tuple(vision_cfg.image_size)
    ps, heads = rc["patch_size"], rc["heads"]
    gh, gw = ih // ps, iw // ps
    x = image.astype(compute_dtype)
    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["proj"]["kernel"].astype(compute_dtype),
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["proj"]["bias"].astype(compute_dtype)
    x = x.reshape(x.shape[0], gh * gw, -1)
    num_prefix = 1 if "cls_token" in params else 0
    if num_prefix:
        cls = jnp.broadcast_to(params["cls_token"].astype(compute_dtype),
                               (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)

    coords = jnp.asarray(_rel_log_coords(gh, gw))
    dim = x.shape[-1]
    hd = dim // heads

    def block(bp, x):
        shortcut = x
        h = layer_norm(x, bp["norm1"]["scale"], bp["norm1"]["bias"])
        qkv = linear(h, bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"].get("bias"))
        q, k, v = jnp.split(qkv.reshape(x.shape[0], -1, 3, heads, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd ** -0.5
        logits = logits + _rel_bias(bp["attn"], coords, heads, num_prefix)[None].astype(jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(x.shape[0], -1, dim)
        x = shortcut + linear(out, bp["attn"]["proj"]["kernel"], bp["attn"]["proj"].get("bias"))
        h = layer_norm(x, bp["norm2"]["scale"], bp["norm2"]["bias"])
        h = linear(h, bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"].get("bias"))
        h = gelu(h)
        h = linear(h, bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"].get("bias"))
        return x + h

    body = block
    if remat:
        body = jax.checkpoint(block, prevent_cse=False, policy=B.remat_policy())
    for bp in params["blocks"]:
        x = body(bp, x)
    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    pooled = x[:, 0] if num_prefix else x.mean(axis=1)  # '_cls' variant pools the token
    out = jnp.dot(pooled, params["head"]["proj"]["kernel"].astype(pooled.dtype))
    if "bias" in params["head"]["proj"]:
        out = out + params["head"]["proj"]["bias"].astype(out.dtype)
    return out


def torch_relpos_to_params(sd: Dict[str, Any], vision_cfg: CLIPVisionCfg) -> Dict[str, Any]:
    """timm relpos-ViT trunk state dict -> native param tree.

    Key layout per timm ``vision_transformer_relpos.py`` (the reference serves
    this tower via ``src/open_clip/timm_model.py:25``): ``patch_embed.proj``,
    ``cls_token``, ``blocks.{i}.{norm1,attn.qkv,attn.rel_pos.mlp.fc1/fc2,
    attn.proj,norm2,mlp.fc1/fc2}``, top-level ``norm``; the open_clip TimmModel
    adapter projection arrives as ``head.proj`` (``visual.head.proj.weight``,
    bias-free for the registry config's ``timm_proj='linear'``/
    ``proj_bias=False``). Buffers (``rel_coords_log``,
    ``relative_position_index``) are recomputed natively and skipped here.
    qkv / rel-MLP fc2 biases are optional (timm relpos variants use
    ``qkv_bias=False`` and ``Mlp(bias=(True, False))``).
    """
    rc = _cfg(vision_cfg)

    def t(v):
        return jnp.asarray(np.asarray(v))

    def lin(prefix: str) -> Dict[str, Any]:
        out = {"kernel": t(sd[prefix + ".weight"]).T}
        if prefix + ".bias" in sd:
            out["bias"] = t(sd[prefix + ".bias"])
        return out

    def ln(prefix: str) -> Dict[str, Any]:
        return {"scale": t(sd[prefix + ".weight"]), "bias": t(sd[prefix + ".bias"])}

    p: Dict[str, Any] = {
        "patch_embed": {
            "proj": {"kernel": t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
                     "bias": t(sd["patch_embed.proj.bias"])},
        },
        "blocks": [],
        "norm": ln("norm") if "norm.weight" in sd else ln("fc_norm"),
    }
    if "cls_token" in sd:
        p["cls_token"] = t(sd["cls_token"]).reshape(-1)
    for i in range(rc["depth"]):
        b = f"blocks.{i}"
        p["blocks"].append({
            "norm1": ln(f"{b}.norm1"),
            "attn": {
                "qkv": lin(f"{b}.attn.qkv"),
                "proj": lin(f"{b}.attn.proj"),
                "rel_mlp": {
                    "fc1": lin(f"{b}.attn.rel_pos.mlp.fc1"),
                    "fc2": lin(f"{b}.attn.rel_pos.mlp.fc2"),
                },
            },
            "norm2": ln(f"{b}.norm2"),
            "mlp": {"fc1": lin(f"{b}.mlp.fc1"), "fc2": lin(f"{b}.mlp.fc2")},
        })
    if "head.proj.weight" in sd:
        p["head"] = {"proj": lin("head.proj")}
    elif "head.weight" in sd:  # trunk classifier head as projection (timm_proj none)
        p["head"] = {"proj": lin("head")}
    return p
