"""Swin-Transformer image tower (timm ``swin_base_patch4_window7_224``).

The reference serves this tower through timm (reference ``src/open_clip/timm_model.py:25``
with ``model_configs/swin_base_patch4_window7_224.json``). Here it is built natively
from the same window-attention machinery as the HTSAT audio encoder
(:mod:`open_clip_tpu.models.htsat` — HTSAT is a Swin derivative, so the block math,
relative-position bias tables, shifted-window masks and patch merging are shared).

Geometry for the base/224 config: 4x4 patch embed -> 56x56 tokens at dim 128,
stages of depths (2, 2, 18, 2) with heads (4, 8, 16, 32) and patch merging between
stages (56 -> 28 -> 14 -> 7), window 7 with shift 3 on odd blocks (the final 7x7
stage is a single window, so no shift), final LN + global average pool -> 1024
features -> linear projection to ``embed_dim``.

No pretrained (model, tag) pair exists for this config in the reference registry,
and timm is not installed in this environment, so parity coverage is structural
(shapes, invariances, trainability) rather than checkpoint-level.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPVisionCfg, to_2tuple
from ..ops.layers import layer_norm, linear
from . import blocks as B
from .htsat import (
    _init_swin_block,
    _patch_merge,
    _swin_block_apply,
    _trunc_normal,
)

SWIN_CONFIGS: Dict[str, Dict[str, Any]] = {
    "swin_base_patch4_window7_224": dict(
        patch_size=4, embed_dim=128, depths=(2, 2, 18, 2), heads=(4, 8, 16, 32),
        window=7, mlp_ratio=4.0,
    ),
    "swin_tiny_patch4_window7_224": dict(
        patch_size=4, embed_dim=96, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24),
        window=7, mlp_ratio=4.0,
    ),
    "swin_small_patch4_window7_224": dict(
        patch_size=4, embed_dim=96, depths=(2, 2, 18, 2), heads=(3, 6, 12, 24),
        window=7, mlp_ratio=4.0,
    ),
    "swin_large_patch4_window7_224": dict(
        patch_size=4, embed_dim=192, depths=(2, 2, 18, 2), heads=(6, 12, 24, 48),
        window=7, mlp_ratio=4.0,
    ),
}


def is_swin(vision_cfg: CLIPVisionCfg) -> bool:
    name = vision_cfg.timm_model_name or ""
    return name.startswith("swin_")


def _cfg(vision_cfg: CLIPVisionCfg) -> Dict[str, Any]:
    name = vision_cfg.timm_model_name
    if name not in SWIN_CONFIGS:
        raise NotImplementedError(f"Swin variant {name!r} has no native TPU config yet")
    return SWIN_CONFIGS[name]


def init_swin(key, vision_cfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    sc = _cfg(vision_cfg)
    dims = [sc["embed_dim"] * (2 ** i) for i in range(len(sc["depths"]))]
    ks = jax.random.split(key, 4 + len(sc["depths"]))
    p: Dict[str, Any] = {
        "patch_embed": {
            "proj": {"kernel": _trunc_normal(
                ks[0], (sc["patch_size"], sc["patch_size"], 3, dims[0])),
                "bias": jnp.zeros((dims[0],))},
            "norm": B._ln_params(dims[0]),
        },
        "layers": [],
        "norm": B._ln_params(dims[-1]),
    }
    for li, depth in enumerate(sc["depths"]):
        bkeys = jax.random.split(ks[1 + li], depth + 1)
        layer = {"blocks": [
            _init_swin_block(bkeys[bi], dims[li], sc["heads"][li], sc["window"], sc["mlp_ratio"])
            for bi in range(depth)
        ]}
        if li < len(sc["depths"]) - 1:
            layer["downsample"] = {
                "norm": B._ln_params(4 * dims[li]),
                "reduction": {"kernel": _trunc_normal(bkeys[-1], (4 * dims[li], 2 * dims[li]))},
            }
        p["layers"].append(layer)
    proj_key = ks[-1]
    p["head"] = {"proj": {"kernel": _trunc_normal(proj_key, (dims[-1], embed_dim)),
                          "bias": jnp.zeros((embed_dim,))}}
    return p


def apply_swin(
    params: Dict[str, Any],
    vision_cfg: CLIPVisionCfg,
    image: jax.Array,  # (B, H, W, 3)
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    sc = _cfg(vision_cfg)
    ih, iw = to_2tuple(vision_cfg.image_size)
    ps, ws = sc["patch_size"], sc["window"]
    x = image.astype(compute_dtype)

    pe = params["patch_embed"]
    x = jax.lax.conv_general_dilated(
        x, pe["proj"]["kernel"].astype(compute_dtype),
        window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["proj"]["bias"].astype(compute_dtype)
    h, w = ih // ps, iw // ps
    x = x.reshape(x.shape[0], h * w, -1)
    x = layer_norm(x, pe["norm"]["scale"], pe["norm"]["bias"])

    for li, layer in enumerate(params["layers"]):
        heads = sc["heads"][li]
        for bi, bp in enumerate(layer["blocks"]):
            # no shift when the window covers the whole resolution (timm behavior
            # for the final 7x7 stage)
            shift = (ws // 2) if (bi % 2 == 1 and min(h, w) > ws) else 0
            body = lambda p_, x_: _swin_block_apply(
                p_, x_, resolution=(h, w), heads=heads, ws=min(ws, h, w), shift=shift)
            if remat:
                body = jax.checkpoint(body, prevent_cse=False, policy=B.remat_policy())
            x = body(bp, x)
        if "downsample" in layer:
            x = _patch_merge(layer["downsample"], x, (h, w))
            h, w = h // 2, w // 2

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])
    pooled = x.mean(axis=1)  # timm swin default head: global average pool
    return linear(pooled, params["head"]["proj"]["kernel"], params["head"]["proj"].get("bias"))


def torch_swin_to_params(sd: Dict[str, Any], vision_cfg: CLIPVisionCfg) -> Dict[str, Any]:
    """timm Swin state dict (visual tower slice) -> native param tree.

    Handles both patch-merging placements: the original / old-timm layout keeps
    ``layers.{i}.downsample`` at the END of stage ``i`` (exactly the native
    layout), while current timm's ``SwinTransformerStage`` applies it at the
    stage INPUT, so checkpoint keys shift by one (``layers.{i+1}.downsample``
    holds the merge that ends stage ``i``). Both norm-then-reduction orders and
    weight shapes are identical, only the key index differs. Buffers
    (``attn.relative_position_index``, ``attn_mask``) are recomputed natively
    and skipped. The open_clip TimmModel adapter projection arrives as
    ``head.proj`` (bias-free for the registry config's ``timm_proj='linear'``/
    ``proj_bias=False``); a trunk classifier head (``head.fc``,
    ``timm_proj='none'``) is accepted too.
    """
    sc = _cfg(vision_cfg)
    # current-timm layout: merge that ends stage i is stored on stage i+1
    new_layout = ("layers.1.downsample.reduction.weight" in sd
                  and "layers.0.downsample.reduction.weight" not in sd)

    def t(v):
        return jnp.asarray(np.asarray(v))

    p: Dict[str, Any] = {
        "patch_embed": {
            "proj": {"kernel": t(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0),
                     "bias": t(sd["patch_embed.proj.bias"])},
            "norm": {"scale": t(sd["patch_embed.norm.weight"]),
                     "bias": t(sd["patch_embed.norm.bias"])},
        },
        "layers": [],
        "norm": {"scale": t(sd["norm.weight"]), "bias": t(sd["norm.bias"])},
    }
    for li, depth in enumerate(sc["depths"]):
        pre = f"layers.{li}."
        layer: Dict[str, Any] = {"blocks": []}
        for bi in range(depth):
            bpre = f"{pre}blocks.{bi}."
            layer["blocks"].append({
                "norm1": {"scale": t(sd[bpre + "norm1.weight"]), "bias": t(sd[bpre + "norm1.bias"])},
                "attn": {
                    "qkv": {"kernel": t(sd[bpre + "attn.qkv.weight"]).T,
                            "bias": t(sd[bpre + "attn.qkv.bias"])},
                    "proj": {"kernel": t(sd[bpre + "attn.proj.weight"]).T,
                             "bias": t(sd[bpre + "attn.proj.bias"])},
                    "rel_bias": t(sd[bpre + "attn.relative_position_bias_table"]),
                },
                "norm2": {"scale": t(sd[bpre + "norm2.weight"]), "bias": t(sd[bpre + "norm2.bias"])},
                "mlp": {
                    "fc1": {"kernel": t(sd[bpre + "mlp.fc1.weight"]).T,
                            "bias": t(sd[bpre + "mlp.fc1.bias"])},
                    "fc2": {"kernel": t(sd[bpre + "mlp.fc2.weight"]).T,
                            "bias": t(sd[bpre + "mlp.fc2.bias"])},
                },
            })
        ds = f"layers.{li + 1}.downsample." if new_layout else f"{pre}downsample."
        if f"{ds}reduction.weight" in sd:
            layer["downsample"] = {
                "norm": {"scale": t(sd[ds + "norm.weight"]),
                         "bias": t(sd[ds + "norm.bias"])},
                "reduction": {"kernel": t(sd[ds + "reduction.weight"]).T},
            }
        p["layers"].append(layer)
    head_key = "head.proj" if "head.proj.weight" in sd else (
        "head.fc" if "head.fc.weight" in sd else None)
    if head_key is not None:
        p["head"] = {"proj": {"kernel": t(sd[head_key + ".weight"]).T}}
        if head_key + ".bias" in sd:
            p["head"]["proj"]["bias"] = t(sd[head_key + ".bias"])
    return p
