"""Attentional feature fusion (AFF / iAFF / DAF) for long-clip CLAP audio.

TPU-native re-design of reference ``src/open_clip/audio/fusion.py`` (torch AFF/iAFF
from Dai et al., WACV 2021): channel-LAST layout throughout so the 1x1 convs are plain
matmuls on the MXU, and — unlike the reference's ``longer_idx`` dynamic gather
(reference ``audio/htsat.py:1068-1100``) — fusion is computed for the full batch with a
static shape and selected per-sample via ``jnp.where`` on the ``longer`` mask. Same
math, XLA-friendly control flow.

Works for both the "2D" (B, H, W, C) and "1D" (B, T, C) variants: global attention
pools over all non-batch/channel axes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from . import blocks as B


def _init_conv_bn(key, cin: int, cout: int) -> Dict[str, Any]:
    """1x1 conv (as a matmul kernel) + BatchNorm params (torch defaults)."""
    lin = B.torch_linear_init(key, cin, cout)
    return {
        "conv": lin,
        "bn": {"scale": jnp.ones((cout,)), "bias": jnp.zeros((cout,)),
               "mean": jnp.zeros((cout,)), "var": jnp.ones((cout,))},
    }


def _init_att_branch(key, channels: int, r: int) -> Dict[str, Any]:
    inter = channels // r
    k1, k2 = jax.random.split(key)
    return {"fc1": _init_conv_bn(k1, channels, inter), "fc2": _init_conv_bn(k2, inter, channels)}


def init_fusion(key, fusion_type: str, channels: int, r: int = 4) -> Dict[str, Any]:
    """Params for a fusion model. ``fusion_type``: 'daf' | 'aff' | 'iaff' (the _1d/_2d
    suffix only affects layout, not parameters)."""
    base = fusion_type.split("_")[0]
    if base == "daf":
        return {}
    ks = jax.random.split(key, 4)
    p = {"local_att": _init_att_branch(ks[0], channels, r),
         "global_att": _init_att_branch(ks[1], channels, r)}
    if base == "iaff":
        p["local_att2"] = _init_att_branch(ks[2], channels, r)
        p["global_att2"] = _init_att_branch(ks[3], channels, r)
    return p


def _conv_bn(p: Dict[str, Any], x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """1x1 conv + BN (running-stats / inference semantics), channel-last."""
    y = jnp.dot(x, p["conv"]["kernel"].astype(x.dtype))
    if p["conv"].get("bias") is not None:
        y = y + p["conv"]["bias"].astype(y.dtype)
    bn = p["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps) * bn["scale"].astype(jnp.float32)
    return ((y.astype(jnp.float32) - bn["mean"]) * inv + bn["bias"]).astype(x.dtype)


def _att_branch(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    h = _conv_bn(p["fc1"], x)
    h = jax.nn.relu(h)
    return _conv_bn(p["fc2"], h)


def _attention_weights(p_local: Dict[str, Any], p_global: Dict[str, Any], xa: jax.Array) -> jax.Array:
    """sigmoid(local_att(xa) + global_att(avg_pool(xa))), broadcast to xa's shape."""
    spatial_axes = tuple(range(1, xa.ndim - 1))
    xl = _att_branch(p_local, xa)
    xg = _att_branch(p_global, jnp.mean(xa, axis=spatial_axes, keepdims=True))
    return jax.nn.sigmoid(xl + xg)


def apply_fusion(p: Dict[str, Any], fusion_type: str, x: jax.Array, residual: jax.Array) -> jax.Array:
    """Fuse ``x`` (global view) with ``residual`` (local view), channel-last.

    Matches reference forward semantics exactly (fusion.py:114-193): AFF returns
    2*x*w + 2*res*(1-w); iAFF runs a second round seeded by the first fuse; note the
    reference's iAFF second global branch reuses ``global_att`` (fusion.py:125 calls
    self.global_att, not global_att2) — replicated here for checkpoint parity.
    """
    base = fusion_type.split("_")[0]
    if base == "daf":
        return x + residual
    xa = x + residual
    wei = _attention_weights(p["local_att"], p["global_att"], xa)
    if base == "aff":
        return 2 * x * wei + 2 * residual * (1 - wei)
    # iaff
    xi = x * wei + residual * (1 - wei)
    wei2 = _attention_weights(p["local_att2"], p["global_att"], xi)
    return x * wei2 + residual * (1 - wei2)


# ---------------------------------------------------------------------------
# torch converter
# ---------------------------------------------------------------------------

def torch_fusion_to_params(sub: Dict[str, Any]) -> Dict[str, Any]:
    """Reference AFF/iAFF state dict slice (keys like ``local_att.0.weight``) -> tree.

    torch branch layout is Sequential(conv, bn, relu, conv, bn) — indices 0,1,3,4 —
    with an AdaptiveAvgPool prepended for global branches (shifting indices by one).
    """
    import numpy as np

    out: Dict[str, Any] = {}
    for branch in ("local_att", "global_att", "local_att2", "global_att2"):
        keys = {k[len(branch) + 1:]: v for k, v in sub.items() if k.startswith(branch + ".")}
        if not keys:
            continue
        idxs = sorted({int(k.split(".")[0]) for k in keys})
        conv_idx = [i for i in idxs if f"{i}.weight" in keys and keys[f"{i}.weight"].ndim >= 3]
        bn_idx = [i for i in idxs if f"{i}.running_mean" in keys]
        assert len(conv_idx) == 2 and len(bn_idx) == 2, (branch, idxs)
        tree: Dict[str, Any] = {}
        for name, ci, bi in (("fc1", conv_idx[0], bn_idx[0]), ("fc2", conv_idx[1], bn_idx[1])):
            w = np.asarray(keys[f"{ci}.weight"])  # (cout, cin, 1[, 1])
            kernel = w.reshape(w.shape[0], w.shape[1]).T  # (cin, cout)
            conv = {"kernel": kernel}
            if f"{ci}.bias" in keys:
                conv["bias"] = np.asarray(keys[f"{ci}.bias"])
            tree[name] = {
                "conv": conv,
                "bn": {
                    "scale": np.asarray(keys[f"{bi}.weight"]),
                    "bias": np.asarray(keys[f"{bi}.bias"]),
                    "mean": np.asarray(keys[f"{bi}.running_mean"]),
                    "var": np.asarray(keys[f"{bi}.running_var"]),
                },
            }
        out[branch] = tree
    return jax.tree.map(jnp.asarray, out)
