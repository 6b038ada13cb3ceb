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


class AudioTower:
    """Facade mirroring the reference's ``AudioTower`` module
    (reference ``src/open_clip/audio/tower.py:39``, exported from
    ``src/open_clip/__init__.py:59``) over the functional JAX implementation:
    holds the (audio_cfg, embed_dim) pair and dispatches to
    :func:`init_audio_tower` / :func:`apply_audio_tower`. Params stay an
    explicit pytree — there is no module state to carry."""

    def __init__(self, audio_cfg: CLIPAudioCfg, embed_dim: int):
        if isinstance(audio_cfg, dict):
            audio_cfg = CLIPAudioCfg(**audio_cfg)
        self.cfg = audio_cfg
        self.embed_dim = embed_dim

    def init(self, key) -> Dict[str, Any]:
        return init_audio_tower(key, self.cfg, self.embed_dim)

    def __call__(self, params: Dict[str, Any], audio, *, apply_proj: bool = True,
                 compute_dtype=jnp.float32, remat: bool = False) -> jax.Array:
        if isinstance(audio, jax.Array) or not isinstance(audio, dict):
            audio = {"waveform": jnp.asarray(audio)}
        return apply_audio_tower(params, self.cfg, audio, apply_proj=apply_proj,
                                 compute_dtype=compute_dtype, remat=remat)

    apply = __call__


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


# ---------------------------------------------------------------------------
# HF (transformers ClapModel) converter — reference audio/convert.py:76-123
# ---------------------------------------------------------------------------

_HF_BLOCK_SWAPS = (
    ("layernorm_before.", "norm1."),
    ("layernorm_after.", "norm2."),
    ("attention.self.relative_position_bias_table", "attn.relative_position_bias_table"),
    ("attention.output.dense.", "attn.proj."),
    ("intermediate.dense.", "mlp.fc1."),
    ("output.dense.", "mlp.fc2."),
)


def convert_hf_clap_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Transformers ``ClapModel`` keys -> reference-CLAP keys (audio.encoder.* /
    audio.proj.* / text.*), mirroring reference ``audio/convert.py:76-123``: separate
    HF q/k/v projections concatenate into the fused qkv, block submodules rename, and
    the learned audio->text ``logit_scale_a`` maps onto the single symmetric scale."""
    import re

    import numpy as np

    sd = {k.removeprefix("module."): v for k, v in sd.items()}
    out: Dict[str, Any] = {}
    qkv_re = re.compile(
        r"audio_model\.audio_encoder\.layers\.(\d+)\.blocks\.(\d+)\.attention\.self\."
        r"(query|key|value)\.(weight|bias)")
    block_re = re.compile(r"audio_model\.audio_encoder\.layers\.(\d+)\.blocks\.(\d+)\.(.+)")

    grouped: Dict[tuple, Dict[str, Any]] = {}
    for k, v in sd.items():
        m = qkv_re.match(k)
        if m:
            li, bi, name, param = m.groups()
            grouped.setdefault((li, bi, param), {})[name] = v
    for (li, bi, param), tensors in grouped.items():
        if all(n in tensors for n in ("query", "key", "value")):
            out[f"audio.encoder.layers.{li}.blocks.{bi}.attn.qkv.{param}"] = np.concatenate(
                [np.asarray(tensors["query"]), np.asarray(tensors["key"]),
                 np.asarray(tensors["value"])], axis=0)

    for k, v in sd.items():
        if qkv_re.match(k):
            continue
        if k == "logit_scale_a":
            out["logit_scale"] = v
        elif k.endswith((".position_ids", ".token_type_ids", "num_batches_tracked",
                         "relative_position_index", "attn_mask")):
            continue
        elif k.startswith("audio_model.audio_encoder.batch_norm."):
            out[k.replace("audio_model.audio_encoder.batch_norm.", "audio.encoder.bn0.", 1)] = v
        elif k.startswith("audio_model.audio_encoder.patch_embed."):
            out[k.replace("audio_model.audio_encoder.patch_embed.", "audio.encoder.patch_embed.", 1)] = v
        elif k.startswith("audio_model.audio_encoder.norm."):
            out[k.replace("audio_model.audio_encoder.norm.", "audio.encoder.norm.", 1)] = v
        elif block_re.match(k):
            li, bi, suffix = block_re.match(k).groups()
            for old, new in _HF_BLOCK_SWAPS:
                if suffix.startswith(old):
                    out[f"audio.encoder.layers.{li}.blocks.{bi}.{suffix.replace(old, new, 1)}"] = v
                    break
        elif k.startswith("audio_model.audio_encoder.layers."):
            out[k.replace("audio_model.audio_encoder.layers.", "audio.encoder.layers.", 1)] = v
        elif k.startswith("audio_projection.linear1."):
            out[k.replace("audio_projection.linear1.", "audio.proj.0.", 1)] = v
        elif k.startswith("audio_projection.linear2."):
            out[k.replace("audio_projection.linear2.", "audio.proj.2.", 1)] = v
        elif k.startswith("text_model."):
            out[k.replace("text_model.", "text.transformer.", 1)] = v
        elif k.startswith("text_projection.linear1."):
            out[k.replace("text_projection.linear1.", "text.proj.0.", 1)] = v
        elif k.startswith("text_projection.linear2."):
            out[k.replace("text_projection.linear2.", "text.proj.2.", 1)] = v
    return out


def hf_clap_to_params(sd: Dict[str, Any], cfg: CLIPModelCfg) -> Dict[str, Any]:
    """Transformers ClapModel state dict -> JAX param tree.

    The reference layers map via ``convert_hf_clap_state_dict``; the swin blocks then
    go through ``torch_htsat_to_params``, and the roberta text branch converts to the
    Flax params our HF text tower executes (transformers pt->flax utility, offline).
    HF Swin encoders don't carry the token-semantic head (tscam_conv/head), so merge
    converted trees over an init tree (reference loads non-strict the same way).
    """
    from ..convert import _np, _to_jnp
    from . import htsat

    ref_sd = convert_hf_clap_state_dict(sd)
    tree: Dict[str, Any] = {}
    tree["logit_scale"] = jnp.asarray(_np(ref_sd["logit_scale"]).reshape(()))

    enc = htsat.torch_htsat_to_params(
        {k: v for k, v in ref_sd.items() if k.startswith("audio.encoder.")},
        prefix="audio.encoder.")
    proj = {
        "fc1": {"kernel": _np(ref_sd["audio.proj.0.weight"]).T,
                "bias": _np(ref_sd.get("audio.proj.0.bias"))},
        "fc2": {"kernel": _np(ref_sd["audio.proj.2.weight"]).T,
                "bias": _np(ref_sd.get("audio.proj.2.bias"))},
    }
    for fc in proj.values():
        if fc["bias"] is None:
            del fc["bias"]
    tree["audio"] = {"encoder": enc, "proj": _to_jnp(proj)}

    # text: torch roberta -> the HF-Flax-layout tree our native bert_encode reads
    # (hf_native.torch_bert_to_layout replaces transformers' deprecated
    # convert_pytorch_state_dict_to_flax utility)
    from .hf_native import torch_bert_to_layout

    assert cfg.text_cfg is not None and (cfg.text_cfg.hf_model_config or cfg.text_cfg.hf_model_name), \
        "hf-clap conversion expects an HF text tower config"
    text_params = torch_bert_to_layout(
        {k[len("text.transformer."):]: _np(v)
         for k, v in ref_sd.items() if k.startswith("text.transformer.")})
    text_tree: Dict[str, Any] = {"hf": text_params}
    tproj = {
        "fc1": {"kernel": _np(ref_sd["text.proj.0.weight"]).T},
        "fc2": {"kernel": _np(ref_sd["text.proj.2.weight"]).T},
    }
    if ref_sd.get("text.proj.0.bias") is not None:
        tproj["fc1"]["bias"] = _np(ref_sd["text.proj.0.bias"])
    if ref_sd.get("text.proj.2.bias") is not None:
        tproj["fc2"]["bias"] = _np(ref_sd["text.proj.2.bias"])
    text_tree["proj"] = _to_jnp(tproj)
    tree["text"] = text_tree
    return tree
