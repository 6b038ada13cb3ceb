"""Native ViTamin vision towers (NHWC, scan-stacked ViT stage).

The reference builds its ViTamin CLIP towers through timm
(reference ``src/open_clip/timm_model.py:25``, configs
``src/open_clip/model_configs/ViTamin-*.json``: ``timm_pool: ''`` keeps the
trunk's avg-pool, ``timm_proj: linear`` adds the CLIP projection). Here the
tower is implemented natively per the ViTamin paper (Chen et al., CVPR 2024)
in timm ``vitamin.py``'s layout:

- 3-stage hybrid: a 2-conv stem (stride 2), two MBConv-LN stages (each entered
  at stride 2), a strided 3x3 "pool" conv to the transformer width (stride 2,
  total /16), then a plain-ViT stage whose FFN is GeGLU with ratio 2
  (``act(w0(x)) * w1(x) -> w2``) and whose blocks are scan-stacked like the
  other towers.
- MBConv-LN block: channel LayerNorm pre-norm, 1x1 expand (ratio 4) -> GELU ->
  3x3 depthwise (stride on stage entry) -> GELU -> 1x1 project, with an
  avgpool+1x1-conv shortcut when shape changes.
- NHWC end to end; the 1x1 convs are MXU matmuls, only stem/dw/pool convs are
  real convolutions.

Stage tables are sized to the paper's published parameter counts
(S 22M / B 87M / L 333M); ``vitamin_large2`` shares the L trunk (the L2 tags
differ in the text tower, see ViTamin-L2.json). Keys convert from the timm
trunk layout (``visual.trunk.*`` + ``visual.head.proj``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CLIPVisionCfg
from ..ops.layers import layer_norm, linear


@dataclasses.dataclass(frozen=True)
class ViTaminCfg:
    conv_dims: Tuple[int, int]          # C1, C2 (MBConv stages)
    conv_depths: Tuple[int, int]
    embed_dim: int                      # C3 (ViT stage width)
    depth: int                          # ViT blocks
    heads: int
    mlp_ratio: float = 2.0              # GeGLU hidden = ratio * dim
    expand_ratio: float = 4.0           # MBConv expansion
    image_size: int = 224
    ln_eps: float = 1e-6


VITAMIN_CFGS: Dict[str, ViTaminCfg] = {
    "vitamin_small": ViTaminCfg((64, 128), (2, 4), 384, 14, 6),
    "vitamin_base": ViTaminCfg((128, 256), (2, 4), 768, 14, 12),
    "vitamin_large": ViTaminCfg((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_large2": ViTaminCfg((160, 320), (2, 4), 1024, 31, 16),
    "vitamin_xlarge": ViTaminCfg((192, 384), (2, 4), 1152, 32, 16),
}


def _base_name(vcfg: Optional[CLIPVisionCfg]) -> str:
    name = (getattr(vcfg, "timm_model_name", None) or "").split(".")[0]
    # strip trailing resolution: vitamin_large2_224 -> vitamin_large2
    parts = name.split("_")
    if parts and parts[-1].isdigit():
        parts = parts[:-1]
    return "_".join(parts)


def is_vitamin(vcfg: Optional[CLIPVisionCfg]) -> bool:
    return _base_name(vcfg) in VITAMIN_CFGS


def parse_vitamin_cfg(vcfg: CLIPVisionCfg) -> ViTaminCfg:
    cfg = VITAMIN_CFGS[_base_name(vcfg)]
    size = vcfg.image_size if isinstance(vcfg.image_size, int) else vcfg.image_size[0]
    return dataclasses.replace(cfg, image_size=size)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin_g, cout, bias=True) -> Dict[str, Any]:
    fan_in = kh * kw * cin_g
    p = {"kernel": jax.random.normal(key, (kh, kw, cin_g, cout)) * (2.0 / fan_in) ** 0.5}
    if bias:
        p["bias"] = jnp.zeros((cout,))
    return p


def _ln_init(dim) -> Dict[str, Any]:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _mbconv_init(key, cin, cout, expand, stride) -> Dict[str, Any]:
    mid = int(cout * expand)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p = {
        "pre_norm": _ln_init(cin),
        "conv1_1x1": _conv_init(k1, 1, 1, cin, mid),
        "conv2_kxk": _conv_init(k2, 3, 3, 1, mid),  # depthwise
        "conv3_1x1": _conv_init(k3, 1, 1, mid, cout),
    }
    if stride == 2 or cin != cout:
        p["down"] = _conv_init(k4, 1, 1, cin, cout)
    return p


def _vit_block_init(key, dim, heads, hidden) -> Dict[str, Any]:
    kq, kp, k0, k1, k2 = jax.random.split(key, 5)
    s = dim ** -0.5
    return {
        "ln_1": _ln_init(dim),
        "attn": {
            "qkv": {"kernel": jax.random.normal(kq, (dim, 3 * dim)) * s,
                    "bias": jnp.zeros((3 * dim,))},
            "proj": {"kernel": jax.random.normal(kp, (dim, dim)) * s,
                     "bias": jnp.zeros((dim,))},
        },
        "mlp": {
            "norm": _ln_init(dim),
            "w0": {"kernel": jax.random.normal(k0, (dim, hidden)) * s, "bias": jnp.zeros((hidden,))},
            "w1": {"kernel": jax.random.normal(k1, (dim, hidden)) * s, "bias": jnp.zeros((hidden,))},
            "w2": {"kernel": jax.random.normal(k2, (hidden, dim)) * hidden ** -0.5,
                   "bias": jnp.zeros((dim,))},
        },
    }


def init_vitamin(key, vcfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    cfg = parse_vitamin_cfg(vcfg)
    keys = jax.random.split(key, 8)
    c1, c2 = cfg.conv_dims
    d = cfg.embed_dim
    params: Dict[str, Any] = {
        "stem": {
            "conv1": _conv_init(keys[0], 3, 3, 3, c1),
            "norm1": _ln_init(c1),
            "conv2": _conv_init(keys[1], 3, 3, c1, c1),
            "norm2": _ln_init(c1),
        },
        "stages": {},
    }
    for i, (depth, cout) in enumerate(zip(cfg.conv_depths, cfg.conv_dims)):
        cin = c1 if i == 0 else cfg.conv_dims[i - 1]
        blocks = []
        for j in range(depth):
            bk = jax.random.fold_in(keys[2], i * 100 + j)
            blocks.append(_mbconv_init(bk, cin if j == 0 else cout, cout,
                                       cfg.expand_ratio, 2 if j == 0 else 1))
        params["stages"][str(i)] = {"blocks": blocks}  # ragged first block: plain list
    params["pool"] = {"norm": _ln_init(c2), "conv": _conv_init(keys[3], 3, 3, c2, d)}
    grid = cfg.image_size // 16
    params["pos_embed"] = jax.random.normal(keys[4], (grid * grid, d)) * 0.02
    hidden = int(d * cfg.mlp_ratio)
    vit_blocks = [_vit_block_init(jax.random.fold_in(keys[5], j), d, cfg.heads, hidden)
                  for j in range(cfg.depth)]
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *vit_blocks)
    params["norm"] = _ln_init(d)
    params["proj"] = {"kernel": jax.random.normal(keys[6], (d, embed_dim)) * d ** -0.5,
                      "bias": jnp.zeros((embed_dim,))}
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _conv(x, p, stride: int = 1, groups: int = 1):
    w = p["kernel"].astype(x.dtype)
    kh, kw = w.shape[0], w.shape[1]
    # torch-style symmetric padding (k//2) — XLA "SAME" shifts the grid at stride 2
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def _gelu(x):
    from ..ops.layers import gelu

    return gelu(x)


def _ln(x, p, eps):
    return layer_norm(x, p["scale"], p["bias"], eps=eps)


def _mbconv(p, x, stride: int, eps: float):
    mid_groups = p["conv2_kxk"]["kernel"].shape[-1]
    shortcut = x
    if "down" in p:
        if stride == 2:
            shortcut = jax.lax.reduce_window(
                shortcut, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "SAME") / 4.0
        shortcut = _conv(shortcut, p["down"])
    h = _ln(x, p["pre_norm"], eps)
    h = _gelu(_conv(h, p["conv1_1x1"]))
    h = _gelu(_conv(h, p["conv2_kxk"], stride=stride, groups=mid_groups))
    h = _conv(h, p["conv3_1x1"])
    return shortcut + h


def _vit_block(p, x, heads: int, eps: float):
    from ..ops.attention import dot_product_attention

    b, l, c = x.shape
    hd = c // heads
    h = _ln(x, p["ln_1"], eps)
    qkv = jnp.dot(h, p["attn"]["qkv"]["kernel"].astype(h.dtype)) \
        + p["attn"]["qkv"]["bias"].astype(h.dtype)
    q, k, v = [u.reshape(b, l, heads, hd) for u in jnp.split(qkv, 3, axis=-1)]
    ctx = dot_product_attention(q, k, v).reshape(b, l, c)
    ctx = jnp.dot(ctx, p["attn"]["proj"]["kernel"].astype(h.dtype)) \
        + p["attn"]["proj"]["bias"].astype(h.dtype)
    x = x + ctx
    h = _ln(x, p["mlp"]["norm"], eps)
    g = _gelu(linear(h, p["mlp"]["w0"]["kernel"], p["mlp"]["w0"]["bias"]))
    u = linear(h, p["mlp"]["w1"]["kernel"], p["mlp"]["w1"]["bias"])
    h = linear(g * u, p["mlp"]["w2"]["kernel"], p["mlp"]["w2"]["bias"])
    return x + h


def apply_vitamin(
    params: Dict[str, Any],
    vcfg: CLIPVisionCfg,
    images: jax.Array,  # (B, H, W, 3) NHWC normalized
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    del train, rng
    cfg = parse_vitamin_cfg(vcfg)
    eps = cfg.ln_eps
    x = images.astype(compute_dtype)
    x = _gelu(_ln(_conv(x, params["stem"]["conv1"], stride=2), params["stem"]["norm1"], eps))
    x = _gelu(_ln(_conv(x, params["stem"]["conv2"]), params["stem"]["norm2"], eps))
    for i in range(len(cfg.conv_depths)):
        for j, bp in enumerate(params["stages"][str(i)]["blocks"]):
            x = _mbconv(bp, x, 2 if j == 0 else 1, eps)
    x = _ln(x, params["pool"]["norm"], eps)
    x = _conv(x, params["pool"]["conv"], stride=2)
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh * ww, c)
    if "pos_embed" in params:
        x = x + params["pos_embed"].astype(x.dtype)

    def body(carry, bp):
        fn = _vit_block
        if remat:
            fn = jax.checkpoint(_vit_block, prevent_cse=False, static_argnums=(2,))
        return fn(bp, carry, cfg.heads, eps), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = _ln(x, params["norm"], eps)
    x = x.mean(axis=1)  # global average pool (timm_pool '')
    if "fc_norm" in params:
        x = _ln(x, params["fc_norm"], eps)
    return linear(x, params["proj"]["kernel"], params["proj"].get("bias"))


# ---------------------------------------------------------------------------
# torch checkpoint conversion (timm vitamin trunk layout)
# ---------------------------------------------------------------------------

def _t(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().float().numpy() if hasattr(v, "detach") else v)


def torch_vitamin_clip_to_params(sd: Mapping[str, Any], vcfg: CLIPVisionCfg,
                                 embed_dim: int) -> Dict[str, Any]:
    """Full 'visual.*' slice of a reference checkpoint (timm trunk under
    ``visual.trunk.``, CLIP projection at ``visual.head.proj``) -> native tree."""
    cfg = parse_vitamin_cfg(vcfg)
    sd = {k: _t(v) for k, v in sd.items()}

    def conv(prefix):
        p = {"kernel": jnp.asarray(np.transpose(sd[f"{prefix}.weight"], (2, 3, 1, 0)))}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    def ln(prefix):
        return {"scale": jnp.asarray(sd[f"{prefix}.weight"]),
                "bias": jnp.asarray(sd[f"{prefix}.bias"])}

    def lin(prefix):
        p = {"kernel": jnp.asarray(sd[f"{prefix}.weight"].T)}
        if f"{prefix}.bias" in sd:
            p["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return p

    bb = "trunk.patch_embed.backbone"
    params: Dict[str, Any] = {
        "stem": {
            "conv1": conv(f"{bb}.stem.conv1"), "norm1": ln(f"{bb}.stem.norm1"),
            "conv2": conv(f"{bb}.stem.conv2"), "norm2": ln(f"{bb}.stem.norm2"),
        },
        "stages": {},
    }
    for i, depth in enumerate(cfg.conv_depths):
        blocks = []
        for j in range(depth):
            bp = f"{bb}.stages.{i}.blocks.{j}"
            blk = {
                "pre_norm": ln(f"{bp}.pre_norm"),
                "conv1_1x1": conv(f"{bp}.conv1_1x1"),
                "conv2_kxk": conv(f"{bp}.conv2_kxk"),
                "conv3_1x1": conv(f"{bp}.conv3_1x1"),
            }
            if f"{bp}.down.weight" in sd:
                blk["down"] = conv(f"{bp}.down")
            blocks.append(blk)
        params["stages"][str(i)] = {"blocks": blocks}
    if f"{bb}.pool.conv.weight" in sd:
        params["pool"] = {"norm": ln(f"{bb}.pool.norm"), "conv": conv(f"{bb}.pool.conv")}
    else:  # HybridEmbed-style projection
        params["pool"] = {"norm": ln("trunk.patch_embed.norm"),
                          "conv": conv("trunk.patch_embed.proj")}
    if "trunk.pos_embed" in sd:
        pe = sd["trunk.pos_embed"]
        params["pos_embed"] = jnp.asarray(pe.reshape(-1, pe.shape[-1]))
    d = cfg.embed_dim
    blocks = []
    for i in range(cfg.depth):
        bp = f"trunk.blocks.{i}"
        mlp = {}
        if f"{bp}.mlp.w0.weight" in sd:
            mlp = {"norm": ln(f"{bp}.mlp.norm"), "w0": lin(f"{bp}.mlp.w0"),
                   "w1": lin(f"{bp}.mlp.w1"), "w2": lin(f"{bp}.mlp.w2")}
        elif f"{bp}.mlp.fc1_g.weight" in sd:  # timm GluMlp naming variant
            mlp = {"norm": ln(f"{bp}.mlp.norm"), "w0": lin(f"{bp}.mlp.fc1_g"),
                   "w1": lin(f"{bp}.mlp.fc1_x"), "w2": lin(f"{bp}.mlp.fc2")}
        blocks.append({
            "ln_1": ln(f"{bp}.norm1"),
            "attn": {"qkv": lin(f"{bp}.attn.qkv"), "proj": lin(f"{bp}.attn.proj")},
            "mlp": mlp,
        })
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    params["norm"] = ln("trunk.norm") if "trunk.norm.weight" in sd else ln("trunk.fc_norm")
    if "trunk.fc_norm.weight" in sd and "trunk.norm.weight" in sd:
        params["fc_norm"] = ln("trunk.fc_norm")
    params["proj"] = lin("head.proj")
    return params
