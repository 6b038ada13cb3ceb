"""Whisper audio encoder — TPU-native.

Functional re-design of reference ``src/open_clip/audio/whisper.py:247-379``
(WhisperEncoder): on-device log-mel (ops/audio.py, fused into the forward program),
Conv1d x2 stem (NWC layout), sinusoidal positions, pre-LN transformer blocks (stacked
scan), avg-pool-2, ln_post + projection, optional audio bos/eos token embeddings.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.audio import log_mel_whisper
from ..ops.layers import gelu, layer_norm, linear
from . import blocks as B

N_MELS = 80
N_FRAMES = 3000  # 30 s at 16 kHz / hop 160

WHISPER_CONFIGS = {
    "tiny": dict(n_layer=4, width=384, heads=6),
    "base": dict(n_layer=6, width=512, heads=8),
    "small": dict(n_layer=12, width=768, heads=12),
    "medium": dict(n_layer=24, width=1024, heads=16),
    "large": dict(n_layer=32, width=1280, heads=20),
}


def t_after_cnn(l_in: int) -> int:
    """Frame count after the two convs (reference whisper.py:44-50)."""
    for padding, kernel, stride in [(1, 3, 1), (1, 3, 2)]:
        l_in = 1 + (l_in + 2 * padding - kernel - 1 + 1) // stride
    return l_in


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_whisper_encoder(key, name: str, output_dim: int) -> Tuple[Dict[str, Any], Dict[str, int]]:
    cfg = WHISPER_CONFIGS[name]
    width, heads, n_layer = cfg["width"], cfg["heads"], cfg["n_layer"]
    ks = jax.random.split(key, 8)
    n_ctx = t_after_cnn(N_FRAMES)

    def conv_init(k, cin, cout):
        bound = 1.0 / math.sqrt(cin * 3)
        kk, kb = jax.random.split(k)
        return {
            "kernel": jax.random.uniform(kk, (3, cin, cout), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(kb, (cout,), jnp.float32, -bound, bound),
        }

    def init_block(k):
        bk = jax.random.split(k, 5)
        return {
            "attn_ln": B._ln_params(width),
            "attn": {
                "query": B.torch_linear_init(bk[0], width, width),
                "key": {"kernel": B.torch_linear_init(bk[1], width, width)["kernel"]},  # no bias
                "value": B.torch_linear_init(bk[2], width, width),
                "out": B.torch_linear_init(bk[3], width, width),
            },
            "mlp_ln": B._ln_params(width),
            "mlp": {
                "fc1": B.torch_linear_init(jax.random.fold_in(bk[4], 0), width, 4 * width),
                "fc2": B.torch_linear_init(jax.random.fold_in(bk[4], 1), 4 * width, width),
            },
        }

    params = {
        "conv1": conv_init(ks[0], N_MELS, width),
        "conv2": conv_init(ks[1], width, width),
        "blocks": jax.vmap(init_block)(jax.random.split(ks[2], n_layer)),
        "ln_post": B._ln_params(width),
        "proj": B.torch_linear_init(ks[3], width, output_dim),
        "audio_bos_eos": B.normal_init(ks[4], (2, output_dim), 1.0),
    }
    meta = dict(width=width, heads=heads, n_layer=n_layer, n_ctx=n_ctx, output_dim=output_dim)
    return params, meta


def _conv1d(x: jax.Array, p: Dict[str, jax.Array], stride: int = 1) -> jax.Array:
    """(B, W, C) NWC conv with (K, Cin, Cout) kernel, padding 1."""
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), window_strides=(stride,), padding=[(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _whisper_block(p, x, *, heads):
    from ..ops.attention import multi_head_attention

    h = layer_norm(x, p["attn_ln"]["scale"], p["attn_ln"]["bias"])
    attn_params = {
        "q": p["attn"]["query"],
        "k": {"kernel": p["attn"]["key"]["kernel"]},
        "v": p["attn"]["value"],
        "out": p["attn"]["out"],
    }
    h = multi_head_attention(attn_params, h, kv=h, num_heads=heads)
    x = x + h
    h = layer_norm(x, p["mlp_ln"]["scale"], p["mlp_ln"]["bias"])
    h = linear(h, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"].get("bias"))
    h = gelu(h)
    h = linear(h, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"].get("bias"))
    return x + h


def apply_whisper_encoder(
    params: Dict[str, Any],
    meta: Dict[str, int],
    waveform: jax.Array,  # (B, T) 16 kHz
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> Dict[str, jax.Array]:
    """-> {"embedding": (B, L/2, output_dim), "audio_bos", "audio_eos"}."""
    mel = log_mel_whisper(waveform)  # (B, 80, frames)
    x = mel.transpose(0, 2, 1).astype(compute_dtype)  # (B, frames, 80) NWC
    x = gelu(_conv1d(x, params["conv1"]))
    x = gelu(_conv1d(x, params["conv2"], stride=2))  # (B, L, width)

    pos = jnp.asarray(sinusoids(x.shape[1], meta["width"]))
    x = x + pos.astype(compute_dtype)

    def body(carry, p):
        return _whisper_block(p, carry, heads=meta["heads"]), None

    if remat:
        body = jax.checkpoint(body, prevent_cse=False)
    x, _ = jax.lax.scan(body, x, params["blocks"], unroll=B.scan_unroll())

    # avg pool 2 over time
    b, l, d = x.shape
    x = x[:, : l - l % 2].reshape(b, l // 2, 2, d).mean(axis=2)
    x = layer_norm(x, params["ln_post"]["scale"], params["ln_post"]["bias"])
    x = linear(x, params["proj"]["kernel"], params["proj"].get("bias"))
    return {
        "embedding": x,
        "audio_bos": params["audio_bos_eos"][0][None],
        "audio_eos": params["audio_bos_eos"][1][None],
    }


def torch_whisper_to_params(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Reference WhisperEncoder state dict -> param tree (keys under ``prefix``)."""
    import re as _re

    import numpy as np

    from ..convert import _np, _set, _stack_blocks, _to_jnp

    sub = {k[len(prefix):]: _np(v) for k, v in sd.items() if k.startswith(prefix)}
    tree: Dict[str, Any] = {}
    per_layer: Dict[int, dict] = {}
    block_re = _re.compile(r"^blocks\.(\d+)\.(.*)$")
    m = {
        "attn_ln.weight": ("attn_ln", "scale"),
        "attn_ln.bias": ("attn_ln", "bias"),
        "attn.query.weight": ("attn", "query", "kernel"),
        "attn.query.bias": ("attn", "query", "bias"),
        "attn.key.weight": ("attn", "key", "kernel"),
        "attn.value.weight": ("attn", "value", "kernel"),
        "attn.value.bias": ("attn", "value", "bias"),
        "attn.out.weight": ("attn", "out", "kernel"),
        "attn.out.bias": ("attn", "out", "bias"),
        "mlp_ln.weight": ("mlp_ln", "scale"),
        "mlp_ln.bias": ("mlp_ln", "bias"),
        "mlp.0.weight": ("mlp", "fc1", "kernel"),
        "mlp.0.bias": ("mlp", "fc1", "bias"),
        "mlp.2.weight": ("mlp", "fc2", "kernel"),
        "mlp.2.bias": ("mlp", "fc2", "bias"),
    }
    for k, v in sub.items():
        bm = block_re.match(k)
        if bm:
            idx, rest = int(bm.group(1)), bm.group(2)
            path = m[rest]
            val = v.T if rest.endswith(".weight") and "ln" not in rest else v
            _set(per_layer.setdefault(idx, {}), path, val)
            continue
        if k in ("conv1.weight", "conv2.weight"):
            # torch conv1d (Cout, Cin, K) -> (K, Cin, Cout)
            _set(tree, (k.split(".")[0], "kernel"), v.transpose(2, 1, 0))
        elif k in ("conv1.bias", "conv2.bias"):
            _set(tree, (k.split(".")[0], "bias"), v)
        elif k == "positional_embedding":
            continue  # computed
        elif k == "ln_post.weight":
            _set(tree, ("ln_post", "scale"), v)
        elif k == "ln_post.bias":
            _set(tree, ("ln_post", "bias"), v)
        elif k == "proj.weight":
            _set(tree, ("proj", "kernel"), v.T)
        elif k == "proj.bias":
            _set(tree, ("proj", "bias"), v)
        elif k == "audio_bos_eos_token.weight":
            tree["audio_bos_eos"] = v
        else:
            raise KeyError(f"unknown whisper key {k}")
    tree["blocks"] = _stack_blocks(per_layer)
    return _to_jnp(tree)
