"""Model configuration dataclasses and the model-config registry.

Schema-compatible with the reference open_clip JSON model configs
(see reference ``src/open_clip/model.py:37-150`` for the field inventory), so that
user-supplied JSON config files written for the reference library parse unchanged.

Configs for built-in models live in :mod:`open_clip_tpu.model_configs` as python dicts
(equivalent content to the reference's ``model_configs/*.json`` directory scan,
reference ``src/open_clip/factory.py:46-72``).
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

logger = logging.getLogger(__name__)


def _filter_cfg(cls, d: Dict[str, Any], *, strict_unknown: bool = False) -> Dict[str, Any]:
    """Split a raw dict into known dataclass fields, warning on unknown keys."""
    names = {f.name for f in dataclasses.fields(cls)}
    known = {k: v for k, v in d.items() if k in names}
    unknown = sorted(set(d) - names)
    if unknown:
        msg = f"{cls.__name__}: unknown config keys {unknown}"
        if strict_unknown:
            raise ValueError(msg)
        logger.warning(msg)
    return known


@dataclass
class CLIPVisionCfg:
    """Vision tower config. Field names/defaults mirror reference model.py:37-83."""

    layers: Union[Tuple[int, int, int, int], List[int], int] = 12
    width: int = 768
    head_width: int = 64
    mlp_ratio: float = 4.0
    patch_size: Optional[int] = 16
    image_size: Union[Tuple[int, int], int] = 224
    image_seq_len: Optional[int] = None

    ls_init_value: Optional[float] = None
    patch_dropout: float = 0.0
    attentional_pool: Union[bool, str] = False
    attn_pooler_queries: int = 256
    attn_pooler_heads: int = 8
    no_ln_pre: bool = False
    pos_embed_type: str = "learnable"
    final_ln_after_pool: bool = False
    pool_type: str = "tok"
    output_tokens: bool = False
    act_kwargs: Optional[dict] = None
    norm_kwargs: Optional[dict] = None

    # custom attention block settings
    block_type: Optional[str] = None
    qk_norm: bool = False
    scaled_cosine_attn: bool = False
    scale_heads: bool = False
    scale_attn_inner: bool = False
    scale_attn: bool = False
    scale_fc: bool = False

    # class/register token handling (native extensions used to express towers the
    # reference outsources to timm, e.g. SigLIP ViTs: no class token + MAP pooling)
    class_token: bool = True

    # hybrid convolutional stem (native extension for timm vit_base_mci_224, the
    # MobileCLIP-B trunk): patchify-style conv (kernel == stride) + BN + GELU per
    # entry, then a 1x1 projection to ``width`` — replaces the patchify matmul
    conv_stem_channels: Optional[Tuple[int, ...]] = None
    conv_stem_strides: Optional[Tuple[int, ...]] = None

    # accepted for schema compat; timm towers are re-implemented natively (see models/)
    timm_model_name: Optional[str] = None
    timm_model_pretrained: bool = False
    timm_pool: str = "avg"
    timm_proj: str = "linear"
    timm_proj_bias: bool = False
    timm_drop: float = 0.0
    timm_drop_path: Optional[float] = None
    timm_model_kwargs: Optional[dict] = None

    def __post_init__(self):
        if isinstance(self.layers, list):
            self.layers = tuple(self.layers)

    @property
    def is_resnet(self) -> bool:
        return isinstance(self.layers, (tuple, list))

    @property
    def heads(self) -> int:
        return self.width // self.head_width

    @property
    def norm_eps(self) -> float:
        return float((self.norm_kwargs or {}).get("eps", 1e-5))

    @property
    def grid_size(self) -> Tuple[int, int]:
        ih, iw = to_2tuple(self.image_size)
        ph, pw = to_2tuple(self.patch_size)
        return ih // ph, iw // pw


@dataclass
class CLIPTextCfg:
    """Text tower config. Field names/defaults mirror reference model.py:86-150."""

    text_arch: str = "clip"  # "clip" or "modern"
    context_length: int = 77
    variable_text: bool = False
    vocab_size: int = 49408
    hf_tokenizer_name: Optional[str] = None
    tokenizer_mode: Optional[str] = None
    tokenizer_kwargs: Optional[dict] = None

    width: int = 512
    heads: int = 8
    layers: int = 12
    mlp_ratio: float = 4.0
    ls_init_value: Optional[float] = None
    embed_cls: bool = False
    pad_id: int = 0
    bos_id: Optional[int] = None
    eos_id: Optional[int] = None
    tokenizer_type: str = ""
    tiktoken_name: str = "cl100k_base"
    no_causal_mask: bool = False
    final_ln_after_pool: bool = False
    pool_type: str = "argmax"
    proj_bias: bool = False
    proj_type: str = "linear"
    output_tokens: bool = False
    act_kwargs: Optional[dict] = None
    norm_kwargs: Optional[dict] = None

    block_type: Optional[str] = None
    qk_norm: bool = False
    scaled_cosine_attn: bool = False
    scale_heads: bool = False
    scale_attn_inner: bool = False
    scale_attn: bool = False
    scale_fc: bool = False

    # modern text tower settings
    attention_mode: str = "causal"
    pos_embed: str = "rope"
    rope_temperature: float = 10000.0
    mlp_type: str = "swiglu"
    norm_type: Optional[str] = None
    norm_eps: float = 1e-6
    attn_gated: bool = False
    pre_norm: bool = False
    norm_placement: str = "pre"
    zero_init_residual: bool = False
    reg_tokens: int = 0
    value_residual: bool = False
    attention_bias: Optional[bool] = None
    mlp_bias: Optional[bool] = None
    gate_bias: Optional[bool] = None

    # HF text tower (re-implemented natively where needed; fields kept for schema compat)
    hf_model_name: Optional[str] = None
    hf_model_pretrained: bool = True
    hf_proj_type: str = "mlp"
    hf_pooler_type: str = "mean_pooler"
    hf_model_config: Optional[dict] = None

    @property
    def ln_eps(self) -> float:
        return float((self.norm_kwargs or {}).get("eps", 1e-5))


@dataclass
class MultimodalCfg(CLIPTextCfg):
    """CoCa multimodal decoder config (reference coca_model.py:21-27)."""

    mlp_ratio: float = 4.0
    dim_head: int = 64
    heads: int = 8
    n_queries: int = 256
    attn_pooler_heads: int = 8
    cross_attn_ratio: int = 1


@dataclass
class CLIPAudioCfg:
    """Audio tower config (reference audio/config.py:5-34)."""

    model_type: str = "HTSAT"  # HTSAT | whisper | naflexvit
    model_name: str = "tiny"
    audio_length: int = 1024
    clip_samples: int = 480000
    sample_rate: int = 48000
    mel_bins: int = 64
    window_size: int = 1024
    hop_size: int = 480
    fmin: int = 50
    fmax: int = 14000
    class_num: int = 527
    enable_fusion: bool = False
    fusion_type: str = "aff_2d"
    pre_norm: bool = False
    proj_act: str = "gelu"
    training_head: bool = False
    pretrained: bool = False

    # NaFlexClap (model_type == "naflexvit"): spectrogram-ViT encoder geometry
    patch_freq: int = 64
    patch_time: int = 4
    in_chans: int = 1
    patch_pad_mode: str = "floor"
    rope_type: str = "axial"
    audio_seq_len: Optional[int] = None
    naflexvit_cfg: Optional[dict] = None


@dataclass
class CLIPModelCfg:
    """Top-level model config: what a ``model_configs/*.json`` file contains."""

    embed_dim: int = 512
    vision_cfg: Optional[CLIPVisionCfg] = None
    text_cfg: Optional[CLIPTextCfg] = None
    multimodal_cfg: Optional[MultimodalCfg] = None
    audio_cfg: Optional[CLIPAudioCfg] = None
    quick_gelu: bool = False
    custom_text: bool = False
    init_logit_scale: Optional[float] = None
    init_logit_bias: Optional[float] = None

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "CLIPModelCfg":
        d = dict(d)
        vision = d.pop("vision_cfg", None)
        text = d.pop("text_cfg", None)
        mm = d.pop("multimodal_cfg", None)
        audio = d.pop("audio_cfg", None)
        out = cls(**_filter_cfg(cls, d))
        if vision is not None:
            out.vision_cfg = CLIPVisionCfg(**_filter_cfg(CLIPVisionCfg, vision))
        if text is not None:
            out.text_cfg = CLIPTextCfg(**_filter_cfg(CLIPTextCfg, text))
        if mm is not None:
            out.multimodal_cfg = MultimodalCfg(**_filter_cfg(MultimodalCfg, mm))
        if audio is not None:
            out.audio_cfg = CLIPAudioCfg(**_filter_cfg(CLIPAudioCfg, audio))
        return out

    def to_dict(self) -> Dict[str, Any]:
        def clean(dc):
            return {k: v for k, v in dataclasses.asdict(dc).items() if v is not None}

        d: Dict[str, Any] = {"embed_dim": self.embed_dim}
        if self.vision_cfg is not None:
            d["vision_cfg"] = clean(self.vision_cfg)
        if self.text_cfg is not None:
            d["text_cfg"] = clean(self.text_cfg)
        if self.multimodal_cfg is not None:
            d["multimodal_cfg"] = clean(self.multimodal_cfg)
        if self.audio_cfg is not None:
            d["audio_cfg"] = clean(self.audio_cfg)
        for k in ("quick_gelu", "custom_text"):
            if getattr(self, k):
                d[k] = True
        for k in ("init_logit_scale", "init_logit_bias"):
            if getattr(self, k) is not None:
                d[k] = getattr(self, k)
        return d


def to_2tuple(x) -> Tuple:
    if isinstance(x, (tuple, list)):
        assert len(x) == 2
        return tuple(x)
    return (x, x)


# ---------------------------------------------------------------------------
# Registry (mirrors reference factory.py:46-169 semantics)
# ---------------------------------------------------------------------------

_MODEL_CONFIGS: Dict[str, Dict[str, Any]] = {}
_BUILTIN_LOADED = False


def _ensure_builtin_configs() -> None:
    global _BUILTIN_LOADED
    if _BUILTIN_LOADED:
        return
    from . import model_configs as _mc  # lazy import to avoid cycles

    for name, cfg in _mc.BUILTIN_MODEL_CONFIGS.items():
        _MODEL_CONFIGS.setdefault(name, cfg)
    # user config dirs via env var (colon-separated)
    extra = os.environ.get("OPEN_CLIP_TPU_CONFIG_PATH", "")
    for p in filter(None, extra.split(":")):
        try:
            _scan_dir(Path(p))
        except OSError:
            logger.warning("could not scan model-config dir %s", p)
    _BUILTIN_LOADED = True


def _scan_dir(path: Path) -> None:
    for f in sorted(path.glob("*.json")):
        with open(f) as fh:
            cfg = json.load(fh)
        _MODEL_CONFIGS[f.stem] = cfg


def list_models() -> List[str]:
    """Enumerate available model architectures (reference factory.py:140-143)."""
    _ensure_builtin_configs()
    return sorted(_MODEL_CONFIGS.keys(), key=lambda s: s.lower())


def add_model_config(path_or_dict, name: Optional[str] = None) -> None:
    """Register a model config from a JSON file, directory, or dict."""
    _ensure_builtin_configs()
    if isinstance(path_or_dict, dict):
        if not name:
            raise ValueError("name required when adding a config dict")
        _MODEL_CONFIGS[name] = dict(path_or_dict)
        return
    p = Path(path_or_dict)
    if p.is_dir():
        _scan_dir(p)
    else:
        with open(p) as fh:
            _MODEL_CONFIGS[name or p.stem] = json.load(fh)


def get_model_config(model_name: str) -> Optional[Dict[str, Any]]:
    """Fetch a raw config dict by name (reference factory.py:154-160)."""
    _ensure_builtin_configs()
    name = model_name.replace("/", "-")
    cfg = _MODEL_CONFIGS.get(name)
    return json.loads(json.dumps(cfg)) if cfg is not None else None


def parse_model_cfg(model_name: str, **overrides) -> CLIPModelCfg:
    raw = get_model_config(model_name)
    if raw is None:
        raise RuntimeError(
            f"Model config for {model_name} not found; available: {', '.join(list_models())}"
        )
    raw.update({k: v for k, v in overrides.items() if v is not None})
    return CLIPModelCfg.from_dict(raw)
