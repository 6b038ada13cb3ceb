"""NaFlexClap spectrogram-ViT audio encoder — TPU-native.

The reference wraps timm's NaFlexVit over mel patches (reference
``src/open_clip/audio/naflex_tower.py``); here the encoder is built natively on the
GenLIP trunk machinery (models/genlip.py): linear mel-patch embed, axial (freq, time)
rotary positions, bidirectional masked attention over valid patches, MAP
attention-pool head. Same AudioTower contract: patch dict -> pooled (B, embed_dim).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import CLIPAudioCfg
from ..ops.layers import layer_norm, linear
from . import blocks as B
from .genlap import AudioNaFlexCfg, build_audio_position_ids
from .genlip import GenLipTrunkCfg, _norm_params, apply_trunk, build_image_bias, mrope_cos_sin, trunk_mask
from .naflex_vit import _apply_map_pool


def _trunk_cfg_from_audio(acfg: CLIPAudioCfg) -> GenLipTrunkCfg:
    kw = dict(acfg.naflexvit_cfg or {})
    width = kw.get("embed_dim", 512)
    heads = kw.get("num_heads", width // 64)
    head_dim = width // heads
    third = head_dim // 2 // 3
    sec = kw.get("mrope_section", (head_dim // 2 - 2 * third, third, third))
    return GenLipTrunkCfg(
        width=width,
        depth=kw.get("depth", 12),
        num_heads=heads,
        intermediate_size=kw.get("intermediate_size", int(width * kw.get("mlp_ratio", 4.0))),
        text_embed_dim=width,  # unused (no text side)
        mrope_section=tuple(sec),
        gated_attention=kw.get("attn_gated", False),
        use_swiglu_ffn=kw.get("swiglu_mlp", kw.get("use_swiglu_ffn", False)),
        ls_init_value=kw.get("ls_init_value", 0.0),
        norm_type=kw.get("norm_type", "layernorm"),
        qk_norm=kw.get("qk_norm", False),
        attention_bias=kw.get("attention_bias", True),
        mlp_bias=kw.get("mlp_bias", True),
        hidden_act=kw.get("hidden_act", "gelu"),
    )


def audio_naflex_cfg_from_clip_audio(acfg: CLIPAudioCfg) -> AudioNaFlexCfg:
    """Mel/patch geometry of a CLAP naflexvit tower as an AudioNaFlexCfg (shared by
    the encoder init and the data-pipeline patchify)."""
    return AudioNaFlexCfg(
        sample_rate=acfg.sample_rate, window_size=acfg.window_size, hop_size=acfg.hop_size,
        fmin=acfg.fmin, fmax=acfg.fmax, n_mels=acfg.mel_bins,
        patch_freq=acfg.patch_freq, patch_time=acfg.patch_time, in_chans=acfg.in_chans,
    )


def init_naflex_audio_encoder(key, acfg: CLIPAudioCfg) -> Tuple[Dict[str, Any], int]:
    """Returns (params, embed_dim) — the AudioTower projects from embed_dim."""
    from .genlip import GenLipModelCfg, GenLipTextCfg, GenLipVisionCfg, init_genlip

    tcfg = _trunk_cfg_from_audio(acfg)
    ncfg = audio_naflex_cfg_from_clip_audio(acfg)
    width = tcfg.width
    ks = jax.random.split(key, 6)
    proxy = GenLipModelCfg(
        embed_dim=width, vision_cfg=GenLipVisionCfg(),
        text_cfg=GenLipTextCfg(vocab_size=8, pad_id=0, bos_id=1, eos_id=2),
        trunk_cfg=tcfg,
    )
    full = init_genlip(ks[0], proxy)
    p: Dict[str, Any] = {"trunk": full["trunk"]}
    p["patch_embed"] = {"proj": {"kernel": B.normal_init(ks[1], (ncfg.patch_dim, width), 0.02),
                                 "bias": jnp.zeros((width,))}}
    # MAP attention-pool head (timm AttentionPoolLatent shape; see naflex_vit._apply_map_pool)
    kp = jax.random.split(ks[2], 5)
    hidden = int(width * 4.0)
    p["attn_pool"] = {
        "latent": B.normal_init(kp[0], (width,), width ** -0.5),
        "q": B.torch_linear_init(kp[1], width, width),
        "kv": B.torch_linear_init(kp[2], width, 2 * width),
        "proj": B.torch_linear_init(kp[3], width, width),
        "norm": B._ln_params(width),
        "mlp": {
            "c_fc": B.torch_linear_init(jax.random.fold_in(kp[4], 0), width, hidden),
            "c_proj": B.torch_linear_init(jax.random.fold_in(kp[4], 1), hidden, width),
        },
    }
    return p, width


def apply_naflex_audio_encoder(
    params: Dict[str, Any],
    acfg: CLIPAudioCfg,
    audio: Dict[str, jax.Array],
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    tcfg = _trunk_cfg_from_audio(acfg)
    pv = audio["patch_valid"].astype(bool)
    x = audio["patches"].astype(compute_dtype)
    x = linear(x, params["patch_embed"]["proj"]["kernel"], params["patch_embed"]["proj"].get("bias"))

    bias = trunk_mask(0, pv, x.shape[1], tcfg.width // tcfg.num_heads)
    # axial 2-D positions over (freq, time); 1-D time when full-height strips
    rope_1d = (acfg.mel_bins // acfg.patch_freq) == 1 and acfg.rope_type != "axial"
    pos = build_audio_position_ids(audio["patch_coord"], pv, rope_1d=rope_1d)
    cos, sin = mrope_cos_sin(
        pos, tcfg.width // tcfg.num_heads, tcfg.mrope_section, tcfg.rope_theta, True
    )
    x = apply_trunk(params["trunk"], tcfg, x, bias, cos, sin, remat=remat)
    return _apply_map_pool(params["attn_pool"], x, pv, heads=tcfg.num_heads,
                           eps=tcfg.layer_norm_eps, act="gelu")
