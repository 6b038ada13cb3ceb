"""ModifiedResNet (OpenAI RN50-family) — TPU-native.

Functional NHWC re-design of reference ``src/open_clip/modified_resnet.py``:
3-conv stem + blur-free antialias downsampling (avgpool before strided convs),
Bottleneck residual stages, and the QKV AttentionPool2d head. Convs run through
``lax.conv_general_dilated`` with NHWC/HWIO layouts (the TPU-preferred layout);
BatchNorm is applied with stored running statistics folded at fp32 (inference-exact;
train-mode batch-stat threading is handled by the train step via ``use_batch_stats``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPVisionCfg
from . import blocks as B

EXPANSION = 4


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def conv2d(x: jax.Array, kernel: jax.Array, stride: int = 1, padding: int = 0) -> jax.Array:
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _set_nested(tree: Dict[str, Any], path, leaf) -> None:
    for k in path[:-1]:
        tree = tree.setdefault(k, {})
    tree[path[-1]] = leaf


def batch_norm(x: jax.Array, p: Dict[str, jax.Array], eps: float = 1e-5, use_batch_stats: bool = False,
               sink: Optional[Dict[str, Any]] = None, path=()) -> jax.Array:
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    if use_batch_stats:
        mean = x32.mean(axis=(0, 1, 2))
        var = x32.var(axis=(0, 1, 2))
        if sink is not None:
            # running-stat batch contribution; torch tracks the unbiased variance
            n = x32.shape[0] * x32.shape[1] * x32.shape[2]
            _set_nested(sink, path, {"mean": mean, "var": var * (n / max(n - 1, 1))})
    else:
        # running stats are BUFFERS (torch semantics): never differentiated, so
        # the optimizer cannot drift them when an eval-stats forward appears in
        # a training loss (e.g. --lock-image-freeze-bn-stats)
        mean = jax.lax.stop_gradient(p["mean"].astype(jnp.float32))
        var = jax.lax.stop_gradient(p["var"].astype(jnp.float32))
    inv = jax.lax.rsqrt(var + eps) * p["scale"].astype(jnp.float32)
    return ((x32 - mean) * inv + p["bias"].astype(jnp.float32)).astype(dtype)


def avg_pool(x: jax.Array, window: int) -> jax.Array:
    if window <= 1:
        return x
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, window, window, 1), "VALID"
    ) / (window * window)


def _conv_init(key, kh, kw, cin, cout):
    # torch conv default: kaiming_uniform(a=sqrt(5)) => U(-1/sqrt(fan_in), 1/sqrt(fan_in)) scaled
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    return jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -bound, bound)


def _bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)), "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_bottleneck(key, inplanes: int, planes: int, stride: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    p: Dict[str, Any] = {
        "conv1": _conv_init(ks[0], 1, 1, inplanes, planes),
        "bn1": _bn_init(planes),
        "conv2": _conv_init(ks[1], 3, 3, planes, planes),
        "bn2": _bn_init(planes),
        "conv3": _conv_init(ks[2], 1, 1, planes, planes * EXPANSION),
        "bn3": _bn_init(planes * EXPANSION),
    }
    if stride > 1 or inplanes != planes * EXPANSION:
        p["downsample"] = {
            "conv": _conv_init(ks[3], 1, 1, inplanes, planes * EXPANSION),
            "bn": _bn_init(planes * EXPANSION),
        }
    return p


def init_modified_resnet(key, cfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    layers: Tuple[int, ...] = tuple(cfg.layers)
    width = cfg.width
    heads = width * 32 // cfg.head_width  # reference model.py:213
    image_size = cfg.image_size if isinstance(cfg.image_size, int) else cfg.image_size[0]
    ks = jax.random.split(key, 16)

    p: Dict[str, Any] = {
        "conv1": _conv_init(ks[0], 3, 3, 3, width // 2),
        "bn1": _bn_init(width // 2),
        "conv2": _conv_init(ks[1], 3, 3, width // 2, width // 2),
        "bn2": _bn_init(width // 2),
        "conv3": _conv_init(ks[2], 3, 3, width // 2, width),
        "bn3": _bn_init(width),
    }

    inplanes = width
    for li, (n_blocks, stride) in enumerate(zip(layers, (1, 2, 2, 2)), start=1):
        planes = width * (2 ** (li - 1))
        stage = {}
        bkeys = jax.random.split(ks[2 + li], n_blocks)
        for bi in range(n_blocks):
            s = stride if bi == 0 else 1
            stage[str(bi)] = _init_bottleneck(bkeys[bi], inplanes, planes, s)
            inplanes = planes * EXPANSION
        p[f"layer{li}"] = stage

    embed_width = width * 32  # final feature dim
    spacial = image_size // 32
    kp = jax.random.split(ks[10], 5)
    std = embed_width ** -0.5
    p["attnpool"] = {
        "positional_embedding": jax.random.normal(kp[0], (spacial * spacial + 1, embed_width)) * std,
        "q_proj": B.torch_linear_init(kp[1], embed_width, embed_width),
        "k_proj": B.torch_linear_init(kp[2], embed_width, embed_width),
        "v_proj": B.torch_linear_init(kp[3], embed_width, embed_width),
        "c_proj": B.torch_linear_init(kp[4], embed_width, embed_dim),
    }
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _apply_bottleneck(p: Dict[str, Any], x: jax.Array, stride: int, use_batch_stats: bool,
                      sink: Optional[Dict[str, Any]] = None, path=()) -> jax.Array:
    identity = x
    bn = lambda h, name: batch_norm(h, p[name], use_batch_stats=use_batch_stats,
                                    sink=sink, path=path + (name,))
    out = jax.nn.relu(bn(conv2d(x, p["conv1"]), "bn1"))
    out = jax.nn.relu(bn(conv2d(out, p["conv2"], padding=1), "bn2"))
    out = avg_pool(out, stride)
    out = bn(conv2d(out, p["conv3"]), "bn3")
    if "downsample" in p:
        identity = avg_pool(x, stride)
        identity = batch_norm(conv2d(identity, p["downsample"]["conv"]), p["downsample"]["bn"],
                              use_batch_stats=use_batch_stats, sink=sink,
                              path=path + ("downsample", "bn"))
    return jax.nn.relu(out + identity)


def _apply_attn_pool(p: Dict[str, Any], x: jax.Array, num_heads: int) -> jax.Array:
    """(B, H, W, C) -> (B, output_dim) — reference AttentionPool2d (modified_resnet.py:59-85)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h * w, c)
    x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
    x = x + p["positional_embedding"][None].astype(x.dtype)

    def proj(px, pp):
        return jnp.dot(px, pp["kernel"].astype(px.dtype)) + pp["bias"].astype(px.dtype)

    l = h * w + 1
    hd = c // num_heads
    q = proj(x, p["q_proj"]).reshape(b, l, num_heads, hd)
    k = proj(x, p["k_proj"]).reshape(b, l, num_heads, hd)
    v = proj(x, p["v_proj"]).reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, l, c)
    out = proj(out, p["c_proj"])
    return out[:, 0]


def apply_modified_resnet(
    params: Dict[str, Any],
    cfg: CLIPVisionCfg,
    x: jax.Array,  # (B, H, W, 3) normalized NHWC
    *,
    compute_dtype=jnp.float32,
    use_batch_stats: bool = False,
    stats_sink: Optional[Dict[str, Any]] = None,
) -> jax.Array:
    x = x.astype(compute_dtype)
    bs = use_batch_stats
    sink = stats_sink
    for name, stride, pad in (("1", 2, 1), ("2", 1, 1), ("3", 1, 1)):
        x = jax.nn.relu(batch_norm(conv2d(x, params[f"conv{name}"], stride=stride, padding=pad),
                                   params[f"bn{name}"], use_batch_stats=bs,
                                   sink=sink, path=(f"bn{name}",)))
    x = avg_pool(x, 2)

    for li, stride in zip(range(1, 5), (1, 2, 2, 2)):
        stage = params[f"layer{li}"]
        for bi in range(len(stage)):
            x = _apply_bottleneck(stage[str(bi)], x, stride if bi == 0 else 1, bs,
                                  sink=sink, path=(f"layer{li}", str(bi)))

    heads = cfg.width * 32 // cfg.head_width
    return _apply_attn_pool(params["attnpool"], x, heads)


# ---------------------------------------------------------------------------
# torch converter
# ---------------------------------------------------------------------------

def _conv_t(v: np.ndarray) -> np.ndarray:
    return v.transpose(2, 3, 1, 0)  # OIHW -> HWIO


def _bn_t(sd, prefix) -> Dict[str, np.ndarray]:
    return {
        "scale": sd[prefix + ".weight"],
        "bias": sd[prefix + ".bias"],
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }


def torch_resnet_clip_to_params(sd: Dict[str, np.ndarray], cfg) -> Dict[str, Any]:
    """Convert an OpenAI RN-family CLIP state dict (visual.* ModifiedResNet + text tower)."""
    from ..convert import torch_clip_to_params  # text side reuse

    text_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
    tree = torch_clip_to_params(text_sd, cfg)

    v: Dict[str, Any] = {}
    for i in (1, 2, 3):
        v[f"conv{i}"] = _conv_t(sd[f"visual.conv{i}.weight"])
        v[f"bn{i}"] = _bn_t(sd, f"visual.bn{i}")
    for li in range(1, 5):
        stage: Dict[str, Any] = {}
        bi = 0
        while f"visual.layer{li}.{bi}.conv1.weight" in sd:
            pre = f"visual.layer{li}.{bi}"
            bp: Dict[str, Any] = {
                "conv1": _conv_t(sd[f"{pre}.conv1.weight"]),
                "bn1": _bn_t(sd, f"{pre}.bn1"),
                "conv2": _conv_t(sd[f"{pre}.conv2.weight"]),
                "bn2": _bn_t(sd, f"{pre}.bn2"),
                "conv3": _conv_t(sd[f"{pre}.conv3.weight"]),
                "bn3": _bn_t(sd, f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _conv_t(sd[f"{pre}.downsample.0.weight"]),
                    "bn": _bn_t(sd, f"{pre}.downsample.1"),
                }
            stage[str(bi)] = bp
            bi += 1
        v[f"layer{li}"] = stage

    ap = "visual.attnpool"
    v["attnpool"] = {
        "positional_embedding": sd[f"{ap}.positional_embedding"],
        **{
            name: {"kernel": sd[f"{ap}.{name}.weight"].T, "bias": sd[f"{ap}.{name}.bias"]}
            for name in ("q_proj", "k_proj", "v_proj", "c_proj")
        },
    }
    tree["visual"] = _to_jnp_tree(v)
    return tree


def _to_jnp_tree(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp_tree(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp_tree(v) for v in tree]
    return jnp.asarray(tree)
