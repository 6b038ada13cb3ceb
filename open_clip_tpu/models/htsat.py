"""HTSAT: hierarchical token-semantic audio transformer (Swin) — TPU-native.

Functional re-design of reference ``src/open_clip/audio/htsat.py`` (1.2k LoC torch +
torchlibrosa): on-device log-mel (ops/audio.py) -> BatchNorm over mel bins ->
reshape-to-square-image (freq-ratio folding, reference :999-1016) -> 4x4 patch embed ->
4 Swin stages (window attention with relative position bias, alternating shifted
windows, patch merging) -> latent pooling + token-semantic conv head.

Window partition/reverse are pure reshapes; the relative-position index and the
shifted-window masks are static numpy tables baked at trace time. Stages use an
unrolled block loop (<= 12 blocks total) — depth is tiny, shapes shrink per stage,
so scan buys nothing here.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPAudioCfg
from ..ops.audio import log_mel_clap
from ..ops.layers import gelu, layer_norm, linear
from . import blocks as B


# ---------------------------------------------------------------------------
# static tables
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) indices into the (2ws-1)^2 bias table (reference :368-379)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))  # 2, ws, ws
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, N, N
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=32)
def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> Optional[np.ndarray]:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for SW-MSA (reference :503-527)."""
    if shift == 0:
        return None
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    wins = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(x: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    b = x.shape[0] // ((h // ws) * (w // ws))
    x = x.reshape(b, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _trunc_normal(key, shape, std=0.02):
    return jnp.clip(jax.random.normal(key, shape) * std, -2 * std, 2 * std)


def _init_swin_block(key, dim: int, heads: int, ws: int, mlp_ratio: float) -> Dict[str, Any]:
    ks = jax.random.split(key, 6)
    hidden = int(dim * mlp_ratio)
    return {
        "norm1": B._ln_params(dim),
        "attn": {
            "qkv": {"kernel": _trunc_normal(ks[0], (dim, 3 * dim)), "bias": jnp.zeros((3 * dim,))},
            "proj": {"kernel": _trunc_normal(ks[1], (dim, dim)), "bias": jnp.zeros((dim,))},
            "rel_bias": _trunc_normal(ks[2], ((2 * ws - 1) * (2 * ws - 1), heads)),
        },
        "norm2": B._ln_params(dim),
        "mlp": {
            "fc1": {"kernel": _trunc_normal(ks[3], (dim, hidden)), "bias": jnp.zeros((hidden,))},
            "fc2": {"kernel": _trunc_normal(ks[4], (hidden, dim)), "bias": jnp.zeros((dim,))},
        },
    }


def init_htsat(
    key,
    acfg: CLIPAudioCfg,
    embed_dim: int = 96,
    depths: Sequence[int] = (2, 2, 6, 2),
    num_heads: Sequence[int] = (4, 8, 16, 32),
    spec_size: int = 256,
    patch_stride: Tuple[int, int] = (4, 4),
    window_size: int = 8,
    mlp_ratio: float = 4.0,
    num_classes: Optional[int] = None,
) -> Dict[str, Any]:
    num_classes = num_classes if num_classes is not None else acfg.class_num
    num_layers = len(depths)
    num_features = int(embed_dim * 2 ** (num_layers - 1))
    freq_ratio = spec_size // acfg.mel_bins
    ks = jax.random.split(key, 16)

    fusion_type = acfg.fusion_type if acfg.enable_fusion else "none"
    in_chans = 4 if fusion_type == "channel_map" else 1
    p: Dict[str, Any] = {
        "bn0": {"scale": jnp.ones((acfg.mel_bins,)), "bias": jnp.zeros((acfg.mel_bins,)),
                "mean": jnp.zeros((acfg.mel_bins,)), "var": jnp.ones((acfg.mel_bins,))},
        "patch_embed": {
            "proj": {"kernel": _trunc_normal(ks[0], (4, 4, in_chans, embed_dim)),
                     "bias": jnp.zeros((embed_dim,))},
            "norm": B._ln_params(embed_dim),
        },
        "norm": B._ln_params(num_features),
    }
    if fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        # local-branch conv over 3 stacked mel chunks + fusion head inside the patch
        # embed (reference htsat.py:140-153)
        from .fusion import init_fusion

        kf = jax.random.split(ks[11], 2)
        p["patch_embed"]["mel_conv2d"] = {
            "kernel": _trunc_normal(kf[0], (4, 4 * 3, 1, embed_dim)),
            "bias": jnp.zeros((embed_dim,)),
        }
        p["patch_embed"]["fusion"] = init_fusion(kf[1], fusion_type, embed_dim)
    elif fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        # waveform-level 1D fusion over mel bins (reference htsat.py:906-917)
        from .fusion import init_fusion

        kf = jax.random.split(ks[11], 2)
        p["mel_conv1d"] = {
            "conv": {"kernel": _trunc_normal(kf[0], (5, acfg.mel_bins, acfg.mel_bins)),
                     "bias": jnp.zeros((acfg.mel_bins,))},
            "bn": {"scale": jnp.ones((acfg.mel_bins,)), "bias": jnp.zeros((acfg.mel_bins,)),
                   "mean": jnp.zeros((acfg.mel_bins,)), "var": jnp.ones((acfg.mel_bins,))},
        }
        p["fusion"] = init_fusion(kf[1], fusion_type, acfg.mel_bins)

    stages = {}
    res = spec_size // patch_stride[0]
    for li in range(num_layers):
        dim = int(embed_dim * 2 ** li)
        stage_res = res // (2 ** li)
        blocks = []
        bkeys = jax.random.split(ks[1 + li], depths[li])
        for bi in range(depths[li]):
            ws = min(window_size, stage_res)
            blocks.append(_init_swin_block(bkeys[bi], dim, num_heads[li], ws, mlp_ratio))
        stage: Dict[str, Any] = {"blocks": {str(i): b for i, b in enumerate(blocks)}}
        if li < num_layers - 1:
            kd = jax.random.fold_in(ks[1 + li], 99)
            stage["downsample"] = {
                "norm": B._ln_params(4 * dim),
                "reduction": {"kernel": _trunc_normal(kd, (4 * dim, 2 * dim))},
            }
        stages[f"stage{li}"] = stage
    p["stages"] = stages

    sf = spec_size // (2 ** (num_layers - 1)) // patch_stride[0] // freq_ratio
    kt = jax.random.split(ks[10], 2)
    bound = 1.0 / math.sqrt(num_features * sf * 3)
    p["tscam_conv"] = {
        "kernel": jax.random.uniform(kt[0], (sf, 3, num_features, num_classes), jnp.float32, -bound, bound),
        "bias": jnp.zeros((num_classes,)),
    }
    p["head"] = B.torch_linear_init(kt[1], num_classes, num_classes)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _swin_block_apply(p, x, *, resolution: Tuple[int, int], heads: int, ws: int, shift: int):
    h, w = resolution
    b, l, c = x.shape
    shortcut = x
    x = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"])

    n = ws * ws
    scale = (c // heads) ** -0.5
    rel = p["attn"]["rel_bias"][jnp.asarray(relative_position_index(ws).reshape(-1))]
    rel = rel.reshape(n, n, heads).transpose(2, 0, 1)  # (H, N, N)
    mask = shifted_window_mask(h, w, ws, shift)

    from ..ops import swin_attention as _swa
    from ..ops import window_attention as _wa

    if _swa.enabled() and _swa.supports(h, w, ws, heads, c, b):
        # panel kernel: window partition/reverse fold into the kernel, q/k/v
        # stay in the (B, H*W, C) token layout end to end. The shifted roll
        # stays outside (layout-preserving); qkv splits into three (C, C)
        # matmuls so no lane-slice copy is needed either.
        if shift > 0:
            x = jnp.roll(x.reshape(b, h, w, c), (-shift, -shift),
                         axis=(1, 2)).reshape(b, l, c)
        kqkv = p["attn"]["qkv"]["kernel"]
        bqkv = p["attn"]["qkv"].get("bias")
        q = linear(x, kqkv[:, :c], None if bqkv is None else bqkv[:c])
        k = linear(x, kqkv[:, c:2 * c], None if bqkv is None else bqkv[c:2 * c])
        v = linear(x, kqkv[:, 2 * c:], None if bqkv is None else bqkv[2 * c:])
        bias = rel[None].astype(jnp.float32)  # (1, H, N, N)
        if mask is not None:
            bias = bias + jnp.asarray(mask)[:, None]  # (nW, H, N, N)
        out = _swa.panel_attention(q, k, v, bias, hw=(h, w), ws=ws, scale=scale)
        out = linear(out, p["attn"]["proj"]["kernel"], p["attn"]["proj"].get("bias"))
        if shift > 0:
            out = jnp.roll(out.reshape(b, h, w, c), (shift, shift),
                           axis=(1, 2)).reshape(b, l, c)
        x = shortcut + out

        hdn = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
        hdn = linear(hdn, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"].get("bias"))
        hdn = gelu(hdn)
        hdn = linear(hdn, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"].get("bias"))
        return x + hdn

    x = x.reshape(b, h, w, c)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    xw = window_partition(x, ws)  # (B*nW, N, C)

    # window attention with relative position bias
    bw = xw.shape[0]
    qkv = linear(xw, p["attn"]["qkv"]["kernel"], p["attn"]["qkv"].get("bias"))

    nw_bias = 1 if mask is None else mask.shape[0]
    if _wa.enabled() and _wa.supports(n, heads, c, bw, nw_bias):
        # fused Pallas path: q/k/v stay in the (B*nW, N, C) qkv-output layout
        # (no head-split relayouts); rel-pos bias + shift mask ride in as one
        # differentiable additive (nW, H, N, N) input
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        bias = rel[None].astype(jnp.float32)  # (1, H, N, N)
        if mask is not None:
            bias = bias + jnp.asarray(mask)[:, None]  # (nW, H, N, N)
        out = _wa.window_attention(q, k, v, bias, scale=scale).reshape(-1, n, c)
    else:
        q, k, v = jnp.split(qkv.reshape(-1, n, 3, heads, c // heads), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B*nW, N, H, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * scale
        logits = logits + rel[None].astype(jnp.float32)
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(-1, nw, heads, n, n) + jnp.asarray(mask)[None, :, None]
            logits = logits.reshape(-1, heads, n, n)
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(-1, n, c)
    out = linear(out, p["attn"]["proj"]["kernel"], p["attn"]["proj"].get("bias"))

    x = window_reverse(out, ws, h, w)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = shortcut + x.reshape(b, l, c)

    hdn = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"])
    hdn = linear(hdn, p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"].get("bias"))
    hdn = gelu(hdn)
    hdn = linear(hdn, p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"].get("bias"))
    return x + hdn


def _patch_merge(p, x, resolution):
    h, w = resolution
    b, l, c = x.shape
    x = x.reshape(b, h, w, c)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
    ).reshape(b, (h // 2) * (w // 2), 4 * c)
    x = layer_norm(x, p["norm"]["scale"], p["norm"]["bias"])
    return jnp.dot(x, p["reduction"]["kernel"].astype(x.dtype))


@functools.lru_cache(maxsize=32)
def _bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True bicubic interpolation matrix with the torch
    convention (cubic convolution, a = -0.75; jax.image's Keys spline uses a = -0.5,
    which deviates measurably). Border taps clamp-replicate like torch."""
    a = -0.75

    def w(x):
        x = abs(x)
        if x <= 1:
            return (a + 2) * x ** 3 - (a + 3) * x ** 2 + 1
        if x < 2:
            return a * x ** 3 - 5 * a * x ** 2 + 8 * a * x - 4 * a
        return 0.0

    mat = np.zeros((n_out, n_in), np.float64)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for i in range(n_out):
        src = i * scale
        base = int(np.floor(src))
        frac = src - base
        for t in range(-1, 3):
            mat[i, min(max(base + t, 0), n_in - 1)] += w(t - frac)
    return mat.astype(np.float32)


def _bicubic_resize(x, target_t, target_f):
    """(B, C, T, F) -> (B, C, target_t, target_f), align_corners=True torch-bicubic.

    Static shapes make the resize two dense interpolation-matrix matmuls — exact torch
    F.interpolate parity (reference htsat.py:1003-1008) that runs on the MXU instead
    of a gather kernel."""
    t_in, f_in = x.shape[2], x.shape[3]
    if (t_in, f_in) == (target_t, target_f):
        return x
    y = x.astype(jnp.float32)
    if t_in != target_t:
        wt = jnp.asarray(_bicubic_matrix(t_in, target_t))
        y = jnp.einsum("bctf,ut->bcuf", y, wt)
    if f_in != target_f:
        wf = jnp.asarray(_bicubic_matrix(f_in, target_f))
        y = jnp.einsum("bctf,uf->bctu", y, wf)
    return y


def reshape_wav2img(x: jax.Array, spec_size: int, freq_ratio: int) -> jax.Array:
    """(B, C, T, F) mel -> (B, C, spec, spec) via freq-ratio folding (reference :999-1016)."""
    b, c = x.shape[0], x.shape[1]
    target_t = spec_size * freq_ratio
    target_f = spec_size // freq_ratio
    assert x.shape[2] <= target_t and x.shape[3] <= target_f, (
        f"mel {x.shape[2:]} exceeds swin input {(target_t, target_f)}"
    )
    if x.shape[2] != target_t or x.shape[3] != target_f:
        x = _bicubic_resize(x, target_t, target_f)
    x = x.transpose(0, 1, 3, 2)  # (B, C, F, T)
    x = x.reshape(b, c, target_f, freq_ratio, target_t // freq_ratio)
    x = x.transpose(0, 1, 3, 2, 4)  # (B, C, fr, F, T/fr)
    return x.reshape(b, c, freq_ratio * target_f, target_t // freq_ratio)


def _interpolate_frames(x: jax.Array, ratio: int) -> jax.Array:
    """(B, T, C) -> (B, T*ratio, C) frame repeat (reference interpolate, :41-53)."""
    b, t, c = x.shape
    return jnp.repeat(x, ratio, axis=1)


def _fuse_1d(params: Dict[str, Any], fusion_type: str, x: jax.Array, longer: jax.Array) -> jax.Array:
    """1D waveform-level fusion (reference htsat.py:1040-1066): local mel chunks pass a
    strided Conv1d+BN over time, concatenate chunk-major, and fuse with the global mel
    over the mel-bin channel axis. x: (B, 4, T, F) -> (B, 1, T, F)."""
    from .fusion import apply_fusion

    b, nch, t, f = x.shape
    global_x = x[:, 0]  # (B, T, F) — channel-last over mel bins already
    local = x[:, 1:].reshape(b * (nch - 1), t, f)
    mc = params["mel_conv1d"]
    y = jax.lax.conv_general_dilated(
        local, mc["conv"]["kernel"].astype(local.dtype), (3,), [(2, 2)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + mc["conv"]["bias"].astype(local.dtype)
    bn = mc["bn"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5) * bn["scale"].astype(jnp.float32)
    y = (y.astype(jnp.float32) - bn["mean"]) * inv + bn["bias"]
    tl = y.shape[1]
    y = y.reshape(b, (nch - 1) * tl, f)  # chunk-major along time (reference flatten(2))
    if y.shape[1] < t:
        y = jnp.pad(y, ((0, 0), (0, t - y.shape[1]), (0, 0)))
    else:
        y = y[:, :t]
    fused = apply_fusion(params.get("fusion", {}), fusion_type, global_x, y)
    out = jnp.where(longer[:, None, None], fused, global_x)
    return out[:, None]  # (B, 1, T, F)


def _patch_embed_fused(pe: Dict[str, Any], fusion_type: str, x: jax.Array, longer: jax.Array) -> jax.Array:
    """2D fused patch embed (reference htsat.py:155-192): global channel through the
    4x4 proj; the 3 local chunks through a (4, 12)-strided conv, interleaved chunk-major
    along width, zero-padded to the global grid, fused, per-sample selected. Returns
    NHWC (B, gh, gw, embed)."""
    from .fusion import apply_fusion

    b, nch, s, _ = x.shape
    gx = x[:, 0:1].transpose(0, 2, 3, 1)  # NHWC (B, S, S, 1)
    gx = jax.lax.conv_general_dilated(
        gx, pe["proj"]["kernel"].astype(gx.dtype), (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["proj"]["bias"].astype(gx.dtype)  # (B, gh, gw, E)
    gh, gw = gx.shape[1], gx.shape[2]

    lx = x[:, 1:].reshape(b * (nch - 1), s, s, 1)
    lx = jax.lax.conv_general_dilated(
        lx, pe["mel_conv2d"]["kernel"].astype(lx.dtype), (4, 12), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + pe["mel_conv2d"]["bias"].astype(lx.dtype)  # (B*3, gh, wl, E)
    wl = lx.shape[2]
    lx = lx.reshape(b, nch - 1, gh, wl, -1).transpose(0, 2, 1, 3, 4)  # (B, gh, 3, wl, E)
    lx = lx.reshape(b, gh, (nch - 1) * wl, -1)
    if lx.shape[2] < gw:
        lx = jnp.pad(lx, ((0, 0), (0, 0), (0, gw - lx.shape[2]), (0, 0)))
    else:
        lx = lx[:, :, :gw]

    fused = apply_fusion(pe.get("fusion", {}), fusion_type, gx, lx)
    return jnp.where(longer[:, None, None, None], fused, gx)


def apply_htsat(
    params: Dict[str, Any],
    acfg: CLIPAudioCfg,
    audio: Dict[str, jax.Array],
    *,
    embed_dim: int = 96,
    depths: Sequence[int] = (2, 2, 6, 2),
    num_heads: Sequence[int] = (4, 8, 16, 32),
    spec_size: int = 256,
    patch_stride: Tuple[int, int] = (4, 4),
    window_size: int = 8,
    mlp_ratio: float = 4.0,
    compute_dtype=jnp.float32,
    remat: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """waveform dict -> {"embedding" (B, num_features), "clipwise_output",
    "framewise_output", "fine_grained_embedding"} (reference forward_features :937-985).

    With ``acfg.enable_fusion`` the batch carries a host-precomputed ``mel_fusion``
    stack (B, 4, T, F) + ``longer`` mask; fusion is computed full-batch with static
    shapes and selected per-sample (vs the reference's longer_idx dynamic gather,
    htsat.py:1034-1106)."""
    fusion_type = acfg.fusion_type if acfg.enable_fusion else "none"
    fused_input = acfg.enable_fusion and "mel_fusion" in audio
    longer = None
    if fused_input:
        x = audio["mel_fusion"].astype(jnp.float32)  # (B, 4, T, F)
        longer = audio["longer"].reshape(-1).astype(bool)
    else:
        wav = audio["waveform"]
        mel = log_mel_clap(
            wav, sample_rate=acfg.sample_rate, n_fft=acfg.window_size, hop_length=acfg.hop_size,
            n_mels=acfg.mel_bins, fmin=acfg.fmin, fmax=acfg.fmax,
        )  # (B, T, F)
        x = mel[:, None, :, :]  # (B, 1, T, F)

    # bn0 over mel bins with stored stats (reference applies BatchNorm2d on transposed
    # layout; broadcasts over the fusion channel dim)
    bn = params["bn0"]
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + 1e-5) * bn["scale"].astype(jnp.float32)
    x = (x.astype(jnp.float32) - bn["mean"]) * inv + bn["bias"]

    if fused_input and fusion_type in ("daf_1d", "aff_1d", "iaff_1d"):
        x = _fuse_1d(params, fusion_type, x, longer)  # (B, 1, T, F)

    if train and rng is not None:
        x = spec_augment(rng, x)

    freq_ratio = spec_size // acfg.mel_bins
    x = reshape_wav2img(x, spec_size, freq_ratio)  # (B, C, spec, spec)

    if fused_input and fusion_type in ("daf_2d", "aff_2d", "iaff_2d"):
        x = _patch_embed_fused(params["patch_embed"], fusion_type, x.astype(compute_dtype), longer)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
    else:
        if fusion_type == "channel_map" and x.shape[1] == 1:
            x = jnp.broadcast_to(x, (x.shape[0], 4, *x.shape[2:]))
        x = x.transpose(0, 2, 3, 1).astype(compute_dtype)  # NHWC
        # patch embed: conv 4x4 stride 4 + LN
        x = jax.lax.conv_general_dilated(
            x, params["patch_embed"]["proj"]["kernel"].astype(x.dtype), (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params["patch_embed"]["proj"]["bias"].astype(x.dtype)
        b, gh, gw, c = x.shape
        x = x.reshape(b, gh * gw, c)
    x = layer_norm(x, params["patch_embed"]["norm"]["scale"], params["patch_embed"]["norm"]["bias"])

    res = spec_size // patch_stride[0]
    num_layers = len(depths)
    for li in range(num_layers):
        stage = params["stages"][f"stage{li}"]
        stage_res = res // (2 ** li)
        ws = min(window_size, stage_res)
        for bi in range(depths[li]):
            shift = 0 if bi % 2 == 0 else ws // 2
            if stage_res <= window_size:
                shift = 0
            x = _swin_block_apply(
                stage["blocks"][str(bi)], x,
                resolution=(stage_res, stage_res), heads=num_heads[li], ws=ws, shift=shift,
            )
        if "downsample" in stage:
            x = _patch_merge(stage["downsample"], x, (stage_res, stage_res))

    x = layer_norm(x, params["norm"]["scale"], params["norm"]["bias"])  # (B, 64, C)
    num_features = x.shape[-1]
    sf = res // (2 ** (num_layers - 1))
    st = sf
    x = x.transpose(0, 2, 1).reshape(b, num_features, sf, st)  # (B, C, F, T)

    c_freq_bin = sf // freq_ratio
    x = x.reshape(b, num_features, sf // c_freq_bin, c_freq_bin, st)
    x = x.transpose(0, 1, 3, 2, 4).reshape(b, num_features, c_freq_bin, -1)  # (B, C, fbin, T')

    fine = x.mean(axis=2)  # (B, C, T')
    fine_grained = _interpolate_frames(fine.transpose(0, 2, 1), 8 * patch_stride[1])

    latent = x.reshape(b, num_features, -1).mean(axis=-1)  # (B, C)

    # token-semantic conv head: Conv2d (C -> classes), kernel (fbin, 3), pad (0, 1)
    tc = params["tscam_conv"]
    xc = x.transpose(0, 2, 3, 1)  # (B, fbin, T', C) NHWC
    logits = jax.lax.conv_general_dilated(
        xc.astype(compute_dtype), tc["kernel"].astype(compute_dtype), (1, 1),
        [(0, 0), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + tc["bias"].astype(compute_dtype)  # (B, 1, T', classes)
    logits = logits[:, 0]  # (B, T', classes)
    framewise = _interpolate_frames(jax.nn.sigmoid(logits.astype(jnp.float32)), 8 * patch_stride[1])
    clip_logits = logits.mean(axis=1)  # (B, classes)

    return {
        "embedding": latent,
        "clipwise_output": jax.nn.sigmoid(clip_logits.astype(jnp.float32)),
        "framewise_output": framewise,
        "fine_grained_embedding": fine_grained,
    }


def spec_augment(
    rng, x: jax.Array, time_drop_width=64, time_stripes=2, freq_drop_width=8, freq_stripes=2
) -> jax.Array:
    """SpecAugment time/freq stripe masking (torchlibrosa SpecAugmentation semantics)."""
    b, _, t, f = x.shape
    keys = jax.random.split(rng, 4)

    def stripe_mask(key, size, width, n, axis_len):
        starts = jax.random.randint(key, (b, n), 0, max(axis_len - width, 1))
        pos = jnp.arange(axis_len)
        hit = (pos[None, None, :] >= starts[..., None]) & (pos[None, None, :] < (starts[..., None] + width))
        return ~hit.any(axis=1)  # (B, axis_len) True = keep

    tmask = stripe_mask(keys[0], t, time_drop_width, time_stripes, t)
    fmask = stripe_mask(keys[1], f, freq_drop_width, freq_stripes, f)
    return x * tmask[:, None, :, None] * fmask[:, None, None, :]


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------

def torch_htsat_to_params(sd: Dict[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Reference HTSATEncoder state dict -> param tree."""
    import re as _re

    from ..convert import _np, _set, _to_jnp

    sub = {k[len(prefix):]: _np(v) for k, v in sd.items() if k.startswith(prefix)}
    tree: Dict[str, Any] = {"stages": {}}

    # fusion modules (AFF/iAFF/DAF + local-chunk convs, reference htsat.py:136-153,906-917)
    from .fusion import torch_fusion_to_params

    pe_fusion = {k[len("patch_embed.fusion_model."):]: v for k, v in sub.items()
                 if k.startswith("patch_embed.fusion_model.")}
    if pe_fusion:
        tree.setdefault("patch_embed", {})["fusion"] = torch_fusion_to_params(pe_fusion)
    top_fusion = {k[len("fusion_model."):]: v for k, v in sub.items()
                  if k.startswith("fusion_model.")}
    if top_fusion:
        tree["fusion"] = torch_fusion_to_params(top_fusion)

    layer_re = _re.compile(r"^layers\.(\d+)\.(blocks|downsample)\.(.*)$")
    for k, v in sub.items():
        if k.startswith("patch_embed.fusion_model.") or k.startswith("fusion_model."):
            continue
        m = layer_re.match(k)
        if m:
            li, kind, rest = int(m.group(1)), m.group(2), m.group(3)
            stage = tree["stages"].setdefault(f"stage{li}", {})
            if kind == "downsample":
                if rest == "norm.weight":
                    _set(stage, ("downsample", "norm", "scale"), v)
                elif rest == "norm.bias":
                    _set(stage, ("downsample", "norm", "bias"), v)
                elif rest == "reduction.weight":
                    _set(stage, ("downsample", "reduction", "kernel"), v.T)
                continue
            bi, _, brest = rest.partition(".")
            blk = stage.setdefault("blocks", {}).setdefault(bi, {})
            bm = {
                "norm1.weight": ("norm1", "scale"),
                "norm1.bias": ("norm1", "bias"),
                "norm2.weight": ("norm2", "scale"),
                "norm2.bias": ("norm2", "bias"),
                "attn.qkv.weight": ("attn", "qkv", "kernel"),
                "attn.qkv.bias": ("attn", "qkv", "bias"),
                "attn.proj.weight": ("attn", "proj", "kernel"),
                "attn.proj.bias": ("attn", "proj", "bias"),
                "attn.relative_position_bias_table": ("attn", "rel_bias"),
                "mlp.fc1.weight": ("mlp", "fc1", "kernel"),
                "mlp.fc1.bias": ("mlp", "fc1", "bias"),
                "mlp.fc2.weight": ("mlp", "fc2", "kernel"),
                "mlp.fc2.bias": ("mlp", "fc2", "bias"),
            }
            if brest.endswith("relative_position_index") or brest.endswith("attn_mask"):
                continue
            path = bm[brest]
            val = v.T if brest.endswith(".weight") and ("qkv" in brest or "proj" in brest or "fc" in brest) else v
            _set(blk, path, val)
            continue
        if k.startswith("bn0."):
            name = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}.get(
                k.split(".")[1]
            )
            if name:
                _set(tree, ("bn0", name), v)
        elif k == "patch_embed.proj.weight":
            _set(tree, ("patch_embed", "proj", "kernel"), v.transpose(2, 3, 1, 0))
        elif k == "patch_embed.proj.bias":
            _set(tree, ("patch_embed", "proj", "bias"), v)
        elif k == "patch_embed.mel_conv2d.weight":
            _set(tree, ("patch_embed", "mel_conv2d", "kernel"), v.transpose(2, 3, 1, 0))
        elif k == "patch_embed.mel_conv2d.bias":
            _set(tree, ("patch_embed", "mel_conv2d", "bias"), v)
        elif k == "mel_conv1d.0.weight":  # Sequential(Conv1d, BatchNorm1d)
            _set(tree, ("mel_conv1d", "conv", "kernel"), v.transpose(2, 1, 0))
        elif k == "mel_conv1d.0.bias":
            _set(tree, ("mel_conv1d", "conv", "bias"), v)
        elif k.startswith("mel_conv1d.1."):
            name = {"weight": "scale", "bias": "bias", "running_mean": "mean",
                    "running_var": "var"}.get(k.split(".")[-1])
            if name:
                _set(tree, ("mel_conv1d", "bn", name), v)
        elif k == "patch_embed.norm.weight":
            _set(tree, ("patch_embed", "norm", "scale"), v)
        elif k == "patch_embed.norm.bias":
            _set(tree, ("patch_embed", "norm", "bias"), v)
        elif k == "norm.weight":
            _set(tree, ("norm", "scale"), v)
        elif k == "norm.bias":
            _set(tree, ("norm", "bias"), v)
        elif k == "tscam_conv.weight":
            _set(tree, ("tscam_conv", "kernel"), v.transpose(2, 3, 1, 0))
        elif k == "tscam_conv.bias":
            _set(tree, ("tscam_conv", "bias"), v)
        elif k == "head.weight":
            _set(tree, ("head", "kernel"), v.T)
        elif k == "head.bias":
            _set(tree, ("head", "bias"), v)
        elif "num_batches_tracked" in k or "spectrogram_extractor" in k or "logmel_extractor" in k:
            continue
        else:
            raise KeyError(f"unknown htsat key {k}")
    return _to_jnp(tree)
