"""Native ConvNeXt vision tower (NHWC, per-stage scan-stacked blocks).

The reference builds its ``convnext_*`` CLIP towers through timm
(reference ``src/open_clip/timm_model.py:63-110``, configs
``src/open_clip/model_configs/convnext_*.json``: ``timm_pool: ''`` keeps timm's
default avg-pool + head-norm, ``timm_proj`` adds a linear or 2-layer MLP projection).
Here the tower is implemented natively:

- NHWC end to end — the ConvNeXt block (7x7 depthwise conv -> LayerNorm -> pointwise
  MLP with GELU -> LayerScale -> residual) is channels-last math, so on TPU it runs
  without any of the permutes the torch implementation needs.
- Blocks within a stage share one shape, so each stage's blocks are stacked on a
  leading layer axis and applied with ``lax.scan`` (same layout as the ViT towers;
  per-block stochastic-depth rates ride along as scan xs).
- Pointwise convs are plain matmuls on the MXU; only the stem (4x4/4), the 2x2/2
  stage downsamples, and the 7x7 depthwise convs are real convolutions.

Architecture table follows the ConvNeXt paper / timm ``convnext.py`` definitions so
reference checkpoints (``visual.trunk.*`` keys) convert weight-for-weight.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..config import CLIPVisionCfg
from ..ops.layers import gelu, layer_norm, linear

# name -> (depths, dims); matches timm's convnext model registry
CONVNEXT_CFGS: Dict[str, Tuple[Tuple[int, ...], Tuple[int, ...]]] = {
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "convnext_xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "convnext_xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


@dataclasses.dataclass(frozen=True)
class ConvNeXtCfg:
    depths: Tuple[int, ...]
    dims: Tuple[int, ...]
    image_size: int = 224
    drop_path_rate: float = 0.0
    proj: str = "linear"  # 'linear' | 'mlp' | 'none'
    proj_bias: bool = False
    ls_init_value: float = 1e-6


def parse_convnext_cfg(vcfg: CLIPVisionCfg) -> ConvNeXtCfg:
    name = (vcfg.timm_model_name or "").split(".")[0]
    if name not in CONVNEXT_CFGS:
        raise NotImplementedError(f"unknown convnext variant {name!r}")
    depths, dims = CONVNEXT_CFGS[name]
    size = vcfg.image_size if isinstance(vcfg.image_size, int) else vcfg.image_size[0]
    return ConvNeXtCfg(
        depths=depths,
        dims=dims,
        image_size=size,
        drop_path_rate=vcfg.timm_drop_path or 0.0,
        proj=vcfg.timm_proj or "none",
        proj_bias=vcfg.timm_proj_bias,
        ls_init_value=1e-6,
    )


def is_convnext(vcfg: Optional[CLIPVisionCfg]) -> bool:
    return bool(vcfg is not None and vcfg.timm_model_name
                and vcfg.timm_model_name.split(".")[0] in CONVNEXT_CFGS)


# ---------------------------------------------------------------- init


def _trunc_normal(key, shape, std=0.02):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)


def _init_stage(key, depth: int, dim: int, ls_init: float) -> Dict[str, Any]:
    """Stacked block params with a leading (depth,) layer axis."""
    hidden = 4 * dim

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {
            "dwconv": {"kernel": _trunc_normal(k1, (7, 7, 1, dim)), "bias": jnp.zeros((dim,))},
            "norm": {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))},
            "fc1": {"kernel": _trunc_normal(k2, (dim, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": _trunc_normal(k3, (hidden, dim)), "bias": jnp.zeros((dim,))},
            "gamma": jnp.full((dim,), ls_init, jnp.float32),
        }

    return jax.vmap(one)(jax.random.split(key, depth))


def init_convnext(key, vcfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    cfg = parse_convnext_cfg(vcfg)
    keys = jax.random.split(key, len(cfg.depths) + 3)
    dims = cfg.dims
    params: Dict[str, Any] = {
        "stem": {
            "conv": {"kernel": _trunc_normal(keys[0], (4, 4, 3, dims[0])), "bias": jnp.zeros((dims[0],))},
            "norm": {"scale": jnp.ones((dims[0],)), "bias": jnp.zeros((dims[0],))},
        },
        "stages": {},
        "head_norm": {"scale": jnp.ones((dims[-1],)), "bias": jnp.zeros((dims[-1],))},
    }
    for i, (depth, dim) in enumerate(zip(cfg.depths, dims)):
        ks, kd = jax.random.split(keys[1 + i])
        stage: Dict[str, Any] = {"blocks": _init_stage(ks, depth, dim, cfg.ls_init_value)}
        if i > 0:
            stage["downsample"] = {
                "norm": {"scale": jnp.ones((dims[i - 1],)), "bias": jnp.zeros((dims[i - 1],))},
                "conv": {"kernel": _trunc_normal(kd, (2, 2, dims[i - 1], dim)), "bias": jnp.zeros((dim,))},
            }
        params["stages"][str(i)] = stage
    kp = keys[-1]
    if cfg.proj == "linear":
        params["proj"] = {"kernel": _trunc_normal(kp, (dims[-1], embed_dim))}
        if cfg.proj_bias:
            params["proj"]["bias"] = jnp.zeros((embed_dim,))
    elif cfg.proj == "mlp":
        k1, k2 = jax.random.split(kp)
        params["proj_mlp"] = {
            "fc1": {"kernel": _trunc_normal(k1, (dims[-1], 2 * embed_dim)), "bias": jnp.zeros((2 * embed_dim,))},
            "fc2": {"kernel": _trunc_normal(k2, (2 * embed_dim, embed_dim))},
        }
        if cfg.proj_bias:
            params["proj_mlp"]["fc2"]["bias"] = jnp.zeros((embed_dim,))
    return params


# ---------------------------------------------------------------- apply


def _conv(x, p, stride: int, groups: int = 1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y + p["bias"].astype(y.dtype) if "bias" in p else y


def _block(p, x, *, keep_prob: float | jax.Array = 1.0, rng=None):
    dim = x.shape[-1]
    h = _conv(x, p["dwconv"], stride=1, groups=dim)
    h = layer_norm(h, p["norm"]["scale"], p["norm"]["bias"])
    h = linear(h, p["fc1"]["kernel"], p["fc1"]["bias"])
    h = gelu(h)
    h = linear(h, p["fc2"]["kernel"], p["fc2"]["bias"])
    h = h * p["gamma"].astype(h.dtype)
    if rng is not None:
        # stochastic depth: drop the whole residual branch per sample
        mask = jax.random.bernoulli(rng, keep_prob, (x.shape[0], 1, 1, 1))
        h = jnp.where(mask, h / keep_prob, 0.0).astype(h.dtype)
    return x + h


def apply_convnext(
    params: Dict[str, Any],
    vcfg: CLIPVisionCfg,
    images: jax.Array,  # (B, H, W, 3) NHWC normalized
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    cfg = parse_convnext_cfg(vcfg)
    x = images.astype(compute_dtype)
    x = _conv(x, params["stem"]["conv"], stride=4, padding="VALID")
    x = layer_norm(x, params["stem"]["norm"]["scale"], params["stem"]["norm"]["bias"])

    total = sum(cfg.depths)
    dp_rates = np.linspace(0.0, cfg.drop_path_rate, total)
    offset = 0
    use_dp = train and rng is not None and cfg.drop_path_rate > 0.0
    for i in range(len(cfg.depths)):
        stage = params["stages"][str(i)]
        if i > 0:
            x = layer_norm(x, stage["downsample"]["norm"]["scale"], stage["downsample"]["norm"]["bias"])
            x = _conv(x, stage["downsample"]["conv"], stride=2, padding="VALID")
        depth = cfg.depths[i]
        keeps = jnp.asarray(1.0 - dp_rates[offset:offset + depth], jnp.float32)
        if use_dp:
            rngs = jax.random.split(jax.random.fold_in(rng, i), depth)
        else:
            rngs = None

        def body(carry, xs):
            blk = xs[0]
            kp = xs[1] if use_dp else 1.0
            r = xs[2] if use_dp else None
            fn = _block
            if remat:
                fn = jax.checkpoint(_block, static_argnums=())
            return fn(blk, carry, keep_prob=kp, rng=r), None

        xs = (stage["blocks"], keeps, rngs) if use_dp else (stage["blocks"],)
        x, _ = jax.lax.scan(body, x, xs)
        offset += depth

    # timm default head for pool='' (NormMlpClassifierHead, num_classes=0):
    # global avg pool -> LayerNorm
    x = x.mean(axis=(1, 2))
    x = layer_norm(x, params["head_norm"]["scale"], params["head_norm"]["bias"])
    if "proj" in params:
        x = linear(x, params["proj"]["kernel"], params["proj"].get("bias"))
    elif "proj_mlp" in params:
        x = linear(x, params["proj_mlp"]["fc1"]["kernel"], params["proj_mlp"]["fc1"]["bias"])
        x = gelu(x)
        x = linear(x, params["proj_mlp"]["fc2"]["kernel"], params["proj_mlp"]["fc2"].get("bias"))
    return x


# ---------------------------------------------------------------- converter


def _t(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def torch_convnext_clip_to_params(sd: Mapping[str, Any], vcfg: CLIPVisionCfg) -> Dict[str, Any]:
    """Convert the ``visual.*`` slice of a reference timm-ConvNeXt CLIP state dict
    (``visual.trunk.stem/stages/head`` + ``visual.head.proj|mlp``, see reference
    timm_model.py:63-110) into the native param tree."""
    cfg = parse_convnext_cfg(vcfg)
    g = lambda k: _t(sd[k])  # noqa: E731

    def ln(prefix):
        return {"scale": g(f"{prefix}.weight"), "bias": g(f"{prefix}.bias")}

    def conv(prefix):  # torch (O, I, kh, kw) -> HWIO
        return {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
                "bias": g(f"{prefix}.bias")}

    def lin(prefix, bias=True):
        p = {"kernel": _t(sd[f"{prefix}.weight"]).T}
        if bias and f"{prefix}.bias" in sd:
            p["bias"] = g(f"{prefix}.bias")
        return p

    params: Dict[str, Any] = {
        "stem": {"conv": conv("visual.trunk.stem.0"), "norm": ln("visual.trunk.stem.1")},
        "stages": {},
        "head_norm": ln("visual.trunk.head.norm"),
    }
    for i, depth in enumerate(cfg.depths):
        blocks = []
        for j in range(depth):
            b = f"visual.trunk.stages.{i}.blocks.{j}"
            # depthwise torch weight (C, 1, 7, 7) -> (7, 7, 1, C)
            blocks.append({
                "dwconv": {"kernel": _t(sd[f"{b}.conv_dw.weight"]).transpose(2, 3, 1, 0),
                           "bias": g(f"{b}.conv_dw.bias")},
                "norm": ln(f"{b}.norm"),
                "fc1": lin(f"{b}.mlp.fc1"),
                "fc2": lin(f"{b}.mlp.fc2"),
                "gamma": g(f"{b}.gamma"),
            })
        stage: Dict[str, Any] = {
            "blocks": jax.tree.map(lambda *xs: np.stack(xs), *blocks),
        }
        if i > 0:
            d = f"visual.trunk.stages.{i}.downsample"
            stage["downsample"] = {"norm": ln(f"{d}.0"), "conv": conv(f"{d}.1")}
        params["stages"][str(i)] = stage
    if "visual.head.proj.weight" in sd:
        params["proj"] = lin("visual.head.proj")
    elif "visual.head.mlp.fc1.weight" in sd:
        params["proj_mlp"] = {"fc1": lin("visual.head.mlp.fc1"),
                              "fc2": lin("visual.head.mlp.fc2")}
    return params
