"""CLAP: contrastive language-audio pretraining — TPU-native.

Functional re-design of reference ``src/open_clip/clap_model.py`` + ``audio/tower.py``:
the audio tower dispatches on ``model_type`` (whisper | HTSAT | naflexvit spectrogram
ViT) and projects through a 2-layer MLP; text rides the shared text towers. The log-mel
front-ends run on device (ops/audio.py) instead of in host dataloader workers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import CLIPAudioCfg, CLIPModelCfg
from ..ops.layers import ACT_FNS, linear
from . import blocks as B
from . import text as text_mod

HTSAT_CONFIGS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(4, 8, 16, 32)),
    "base": dict(embed_dim=128, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
    "large": dict(embed_dim=256, depths=(2, 2, 12, 2), num_heads=(4, 8, 16, 32)),
}


def _htsat_width(embed_dim: int, num_layers: int = 4) -> int:
    return int(embed_dim * 2 ** (num_layers - 1))


def init_audio_tower(key, acfg: CLIPAudioCfg, embed_dim: int) -> Dict[str, Any]:
    ks = jax.random.split(key, 4)
    p: Dict[str, Any] = {}
    mt = acfg.model_type.lower()
    if mt == "whisper":
        from . import whisper

        p["encoder"], _meta = whisper.init_whisper_encoder(ks[0], acfg.model_name, embed_dim)
        audio_width = embed_dim
    elif mt == "htsat":
        from . import htsat

        hcfg = HTSAT_CONFIGS[acfg.model_name]
        p["encoder"] = htsat.init_htsat(ks[0], acfg, **hcfg)
        audio_width = _htsat_width(hcfg["embed_dim"], len(hcfg["depths"]))
    elif mt == "naflexvit":
        from . import naflex_audio

        p["encoder"], audio_width = naflex_audio.init_naflex_audio_encoder(ks[0], acfg)
    else:
        raise ValueError(f"unsupported audio model type {acfg.model_type!r}")

    # 2-layer MLP projection (reference audio/tower.py:85-91)
    p["proj"] = {
        "fc1": B.torch_linear_init(ks[1], audio_width, embed_dim),
        "fc2": B.torch_linear_init(ks[2], embed_dim, embed_dim),
    }
    return p


def apply_audio_tower(
    params: Dict[str, Any],
    acfg: CLIPAudioCfg,
    audio: Dict[str, jax.Array],
    *,
    apply_proj: bool = True,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> jax.Array:
    mt = acfg.model_type.lower()
    if mt == "whisper":
        from . import whisper

        meta = dict(width=whisper.WHISPER_CONFIGS[acfg.model_name]["width"],
                    heads=whisper.WHISPER_CONFIGS[acfg.model_name]["heads"])
        out = whisper.apply_whisper_encoder(
            params["encoder"], meta, audio["waveform"], compute_dtype=compute_dtype, remat=remat,
        )
        features = out["embedding"].mean(axis=1)
    elif mt == "htsat":
        from . import htsat

        hcfg = HTSAT_CONFIGS[acfg.model_name]
        features = htsat.apply_htsat(
            params["encoder"], acfg, audio, compute_dtype=compute_dtype, remat=remat, **hcfg,
        )["embedding"]
    elif mt == "naflexvit":
        from . import naflex_audio

        features = naflex_audio.apply_naflex_audio_encoder(
            params["encoder"], acfg, audio, compute_dtype=compute_dtype, remat=remat,
        )
    else:
        raise ValueError(acfg.model_type)

    if acfg.pre_norm:
        from .clip import _l2_normalize

        features = _l2_normalize(features)
    if apply_proj:
        act = ACT_FNS["relu" if acfg.proj_act == "relu" else "gelu"]
        h = linear(features, params["proj"]["fc1"]["kernel"], params["proj"]["fc1"].get("bias"))
        features = linear(act(h), params["proj"]["fc2"]["kernel"], params["proj"]["fc2"].get("bias"))
    return features


# ---------------------------------------------------------------------------
# CLAP container
# ---------------------------------------------------------------------------

def init_clap(key, cfg: CLIPModelCfg) -> Dict[str, Any]:
    import math

    ka, kt = jax.random.split(key)
    if cfg.text_cfg.hf_model_name or cfg.text_cfg.hf_model_config:
        from . import hf_text

        text_params = hf_text.init_hf_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
    elif cfg.text_cfg.text_arch == "modern":
        from . import modern_text

        text_params = modern_text.init_modern_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
    else:
        text_params = text_mod.init_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
    params: Dict[str, Any] = {
        "audio": init_audio_tower(ka, cfg.audio_cfg, cfg.embed_dim),
        "text": text_params,
    }
    scale_init = cfg.init_logit_scale if cfg.init_logit_scale is not None else math.log(1 / 0.07)
    params["logit_scale"] = jnp.asarray(scale_init, jnp.float32)
    if cfg.init_logit_bias is not None:
        params["logit_bias"] = jnp.asarray(cfg.init_logit_bias, jnp.float32)
    return params


def encode_audio(params, cfg: CLIPModelCfg, audio, *, normalize: bool = False,
                 compute_dtype=jnp.float32, remat: bool = False) -> jax.Array:
    feats = apply_audio_tower(
        params["audio"], cfg.audio_cfg, audio,
        apply_proj=not cfg.audio_cfg.training_head,
        compute_dtype=compute_dtype, remat=remat,
    )
    if normalize:
        from .clip import _l2_normalize

        feats = _l2_normalize(feats)
    return feats


def clap_forward(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    audio: Optional[Dict[str, jax.Array]] = None,
    text: Optional[jax.Array] = None,
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
) -> Dict[str, jax.Array]:
    """reference CLAP.forward (clap_model.py:92-117), dict output."""
    from .clip import _l2_normalize, encode_text as clip_encode_text

    out: Dict[str, jax.Array] = {}
    if audio is not None:
        out["audio_features"] = encode_audio(
            params, cfg, audio, normalize=True, compute_dtype=compute_dtype, remat=remat
        )
    if text is not None:
        out["text_features"] = clip_encode_text(
            params, cfg, text, normalize=True, compute_dtype=compute_dtype, remat=remat
        )
    out["logit_scale"] = jnp.exp(params["logit_scale"].astype(jnp.float32))
    if "logit_bias" in params:
        out["logit_bias"] = params["logit_bias"].astype(jnp.float32)
    return out


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------

def torch_clap_to_params(sd, cfg: CLIPModelCfg) -> Dict[str, Any]:
    """Reference CLAP state dict (audio.encoder.* / audio.proj.* / text.* / logit_*)
    -> param tree."""
    from ..convert import _np, normalize_torch_state_dict, torch_clip_to_params, _to_jnp

    sd = normalize_torch_state_dict(sd)
    text_sd = {k: v for k, v in sd.items() if not k.startswith("audio.")}
    tree = torch_clip_to_params(text_sd, cfg)

    mt = cfg.audio_cfg.model_type.lower()
    if mt == "whisper":
        from . import whisper

        enc = whisper.torch_whisper_to_params(sd, prefix="audio.encoder.")
    elif mt == "htsat":
        from . import htsat

        enc = htsat.torch_htsat_to_params(sd, prefix="audio.encoder.")
    else:
        raise NotImplementedError(f"clap converter for {mt}")

    proj = {
        "fc1": {"kernel": _np(sd["audio.proj.0.weight"]).T, "bias": _np(sd["audio.proj.0.bias"])},
        "fc2": {"kernel": _np(sd["audio.proj.2.weight"]).T, "bias": _np(sd["audio.proj.2.bias"])},
    }
    tree["audio"] = {"encoder": enc, "proj": _to_jnp(proj)}
    return tree
