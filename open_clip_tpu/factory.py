"""Model factory — the user-facing construction API.

Mirrors the reference surface (``src/open_clip/factory.py``): ``create_model``,
``create_model_and_transforms``, ``create_model_from_pretrained``, ``get_tokenizer``,
``load_checkpoint``; name resolution over the registry; pretrained tags or local
checkpoint paths; preprocess-config plumbing.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .checkpoint import load_checkpoint as _load_checkpoint_into
from .config import (
    CLIPModelCfg,
    get_model_config,
    list_models,
    add_model_config,
    parse_model_cfg,
)
from .models.clip import CLIPModel, init_clip
from .pretrained import get_pretrained_cfg, download_pretrained, list_pretrained_tags_by_model
from .tokenizer import DEFAULT_CONTEXT_LENGTH, HFTokenizer, SimpleTokenizer
from .transform import PreprocessCfg, image_transform_v2, merge_preprocess_dict

logger = logging.getLogger(__name__)

HF_HUB_PREFIX = "hf-hub:"
LOCAL_DIR_PREFIX = "local-dir:"

_PRECISION_DTYPES = {
    "fp32": jnp.float32,
    "bf16": jnp.bfloat16,
    "pure_bf16": jnp.bfloat16,
    "amp_bf16": jnp.bfloat16,
    "fp16": jnp.float16,
    "amp": jnp.bfloat16,  # on TPU, "mixed precision" means bf16 compute
    "pure_bf16": jnp.bfloat16,
    "pure_fp16": jnp.float16,
}


def _compute_dtype(precision: str):
    return _PRECISION_DTYPES.get(precision, jnp.float32)


def create_model(
    model_name: str,
    pretrained: Optional[str] = None,
    precision: str = "fp32",
    force_quick_gelu: bool = False,
    force_custom_text: bool = False,
    force_patch_dropout: Optional[float] = None,
    force_image_size: Optional[Union[int, Tuple[int, int]]] = None,
    force_context_length: Optional[int] = None,
    cache_dir: Optional[str] = None,
    require_pretrained: bool = False,
    seed: int = 0,
    load_weights: bool = True,
    **_ignored,
) -> CLIPModel:
    """Build a model (optionally loading pretrained weights). Returns a CLIPModel facade;
    the functional (cfg, params) pair is available as ``.cfg`` / ``.params``."""
    if not model_name.startswith((HF_HUB_PREFIX, LOCAL_DIR_PREFIX)):
        model_name = model_name.replace("/", "-")
    pretrained_cfg: Dict[str, Any] = {}

    if model_name.startswith(HF_HUB_PREFIX):
        # resolve config + weights from a HF hub repo (reference factory.py:92-152);
        # works against a local HF cache when offline (HF_HUB_OFFLINE=1)
        import json

        from huggingface_hub import hf_hub_download

        model_id = model_name[len(HF_HUB_PREFIX):]
        ckpt_file = None
        parts = model_id.split("/")
        if len(parts) > 2:  # "org/repo/filename" form pins a checkpoint file
            model_id, ckpt_file = "/".join(parts[:2]), "/".join(parts[2:])
        config_path = hf_hub_download(model_id, "open_clip_config.json", cache_dir=cache_dir)
        with open(config_path) as fh:
            hub_cfg = json.load(fh)
        raw_cfg = hub_cfg["model_cfg"]
        pretrained_cfg = {"preprocess_cfg": hub_cfg.get("preprocess_cfg", {})}
        if "genlip_cfg" in raw_cfg or "genlap_cfg" in raw_cfg:
            if load_weights and pretrained is None:
                from .pretrained import download_pretrained_from_hf

                pretrained = download_pretrained_from_hf(
                    model_id, filename=ckpt_file, cache_dir=cache_dir)
            return _create_genlip(raw_cfg, model_name, pretrained, precision, seed, load_weights)
        cfg = CLIPModelCfg.from_dict(raw_cfg)
        if load_weights and pretrained is None:
            from .pretrained import download_pretrained_from_hf

            pretrained = download_pretrained_from_hf(model_id, filename=ckpt_file, cache_dir=cache_dir)
    elif model_name.startswith(LOCAL_DIR_PREFIX):
        import json

        d = Path(model_name[len(LOCAL_DIR_PREFIX):])
        with open(d / "open_clip_config.json") as fh:
            hub_cfg = json.load(fh)
        raw_cfg = hub_cfg["model_cfg"]
        pretrained_cfg = {"preprocess_cfg": hub_cfg.get("preprocess_cfg", {})}
        cfg = CLIPModelCfg.from_dict(raw_cfg)
        ckpt_path = None
        for cand in ("open_clip_model.safetensors", "open_clip_pytorch_model.bin"):
            if (d / cand).exists():
                ckpt_path = str(d / cand)
                break
        pretrained = ckpt_path if pretrained is None else pretrained
    else:
        raw_cfg = get_model_config(model_name)
        if raw_cfg is None:
            raise RuntimeError(f"Model config for {model_name} not found.")
        if "genlip_cfg" in raw_cfg or "genlap_cfg" in raw_cfg:
            return _create_genlip(raw_cfg, model_name, pretrained, precision, seed, load_weights)
        cfg = CLIPModelCfg.from_dict(raw_cfg)

    ckpt_path = ""
    if pretrained:
        if os.path.exists(pretrained):
            ckpt_path = pretrained
        else:
            pretrained_cfg = get_pretrained_cfg(model_name, pretrained)
            if not pretrained_cfg:
                raise RuntimeError(
                    f"Pretrained weights ({pretrained}) not found for model {model_name}. "
                    f"Available tags: {list_pretrained_tags_by_model(model_name)}"
                )
            if pretrained_cfg.get("preprocess_cfg", {}).get("quick_gelu") and not cfg.quick_gelu:
                force_quick_gelu = True
            if load_weights:
                ckpt_path = download_pretrained(pretrained_cfg, cache_dir=cache_dir)

    # config overrides (reference factory.py:450-467)
    if force_quick_gelu:
        cfg.quick_gelu = True
    if force_custom_text:
        cfg.custom_text = True
    if force_patch_dropout is not None and cfg.vision_cfg is not None:
        cfg.vision_cfg.patch_dropout = force_patch_dropout
    if force_image_size is not None and cfg.vision_cfg is not None:
        cfg.vision_cfg.image_size = force_image_size
    if force_context_length is not None and cfg.text_cfg is not None:
        cfg.text_cfg.context_length = force_context_length

    _check_supported(cfg)

    params = init_clip(jax.random.PRNGKey(seed), cfg)

    if ckpt_path and load_weights:
        logger.info("loading pretrained weights from %s", ckpt_path)
        params = _load_checkpoint_into(params, cfg, ckpt_path)
    elif require_pretrained and not ckpt_path:
        raise RuntimeError(f"pretrained weights required but not resolved for {model_name}")

    if precision in ("pure_bf16", "pure_fp16"):
        from .convert import convert_params_dtype

        params = convert_params_dtype(params, _compute_dtype(precision))
    model = CLIPModel(cfg, params, compute_dtype=_compute_dtype(precision))
    model._preprocess_cfg = _build_preprocess_cfg(cfg, pretrained_cfg)
    return model


def _create_genlip(raw_cfg, model_name, pretrained, precision, seed, load_weights):
    """GenLIP/GenLAP dispatch (reference factory.py:510-535 model-class dispatch)."""
    if "genlap_cfg" in raw_cfg:
        from .models import genlap as genlap_mod

        gcfg = genlap_mod.GenLapModelCfg.from_dict(raw_cfg)
        params = genlap_mod.init_genlap(jax.random.PRNGKey(seed), gcfg)
        if pretrained and os.path.exists(pretrained) and load_weights:
            from .checkpoint import read_state_dict

            params = genlap_mod.torch_genlap_to_params(read_state_dict(pretrained), gcfg)
        return genlap_mod.GenLapModel(gcfg, params, compute_dtype=_compute_dtype(precision))
    from .models import genlip as genlip_mod

    gcfg = genlip_mod.GenLipModelCfg.from_dict(raw_cfg)
    params = genlip_mod.init_genlip(jax.random.PRNGKey(seed), gcfg)
    if pretrained and os.path.exists(pretrained) and load_weights:
        from .checkpoint import read_state_dict

        params = genlip_mod.torch_genlip_to_params(read_state_dict(pretrained), gcfg)
    return genlip_mod.GenLipModel(gcfg, params, compute_dtype=_compute_dtype(precision))


def _check_supported(cfg: CLIPModelCfg) -> None:
    v, t = cfg.vision_cfg, cfg.text_cfg
    if v is not None and v.timm_model_name and not v.timm_model_name.startswith("naflexvit"):
        import re

        from .models.convnext import is_convnext
        from .models.eva import EVA_CONFIGS, is_eva
        from .models.fastvit import is_fastvit as _is_fastvit_cfg
        from .models.relpos_vit import is_relpos_vit as _is_relpos_cfg
        from .models.swin import is_swin as _is_swin_cfg
        from .models.vitamin import is_vitamin as _is_vitamin_cfg

        if is_eva(v):
            if v.timm_model_name not in EVA_CONFIGS:
                raise NotImplementedError(
                    f"EVA variant {v.timm_model_name!r} has no native TPU config yet")
        elif not re.match(r"vit_[a-z0-9]+_patch\d+_(siglip|clip|gap)|vit_base_mci", v.timm_model_name) \
                and not is_convnext(v) and not _is_fastvit_cfg(v) and not _is_vitamin_cfg(v) \
                and not _is_swin_cfg(v) and not _is_relpos_cfg(v):
            raise NotImplementedError(
                f"timm vision tower {v.timm_model_name!r} has no native TPU implementation yet"
            )
    # HF text towers run on native JAX encoders (models/hf_native.py, routed via
    # models/hf_text.py); name-only resolution needs hub/cache access for the HF
    # config+weights, hf_model_config builds offline.



def _build_preprocess_cfg(cfg: CLIPModelCfg, pretrained_cfg: Dict[str, Any]) -> PreprocessCfg:
    base = PreprocessCfg()
    if cfg.vision_cfg is not None:
        base.size = cfg.vision_cfg.image_size
    overlay = dict(pretrained_cfg.get("preprocess_cfg", {}))
    overlay.pop("quick_gelu", None)
    return merge_preprocess_dict(base, overlay)


def create_model_and_transforms(
    model_name: str,
    pretrained: Optional[str] = None,
    *,
    image_mean=None,
    image_std=None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    aug_cfg=None,
    **kwargs,
):
    """(model, preprocess_train, preprocess_val) — reference factory.py:1081-1214."""
    model = create_model(model_name, pretrained, **kwargs)
    if hasattr(model.cfg, "trunk_cfg"):
        # GenLIP/GenLAP (reference _build_preprocess, factory.py:1046-1078): NaFlex
        # transforms are bucket factories, not fixed pipelines. GenLAP gets the audio
        # patchify directly; GenLIP gets (seq_len, patch_size) -> transform factories.
        if getattr(model.cfg, "audio_cfg", None) is not None:
            from .data.naflex_audio import AudioNaFlexPatchify, naflex_audio_eval_seq_len

            acfg = model.cfg.audio_cfg
            pp_t = AudioNaFlexPatchify(acfg, max_audio_tokens=naflex_audio_eval_seq_len(acfg))
            return model, pp_t, pp_t
        from .data.naflex import NaFlexTransform

        def _factory(seq_len, patch_size=None):
            return NaFlexTransform(seq_len, patch_size or model.cfg.vision_cfg.patch_size)

        return model, _factory, _factory
    if getattr(model.cfg, "audio_cfg", None) is not None:
        # CLAP: audio transforms, not image ones (reference _build_preprocess audio
        # dispatch, factory.py:1046-1078)
        if model.cfg.audio_cfg.model_type == "naflexvit":
            from .data.naflex_audio import AudioNaFlexPatchify, naflex_audio_eval_seq_len
            from .models.naflex_audio import audio_naflex_cfg_from_clip_audio

            acfg = audio_naflex_cfg_from_clip_audio(model.cfg.audio_cfg)
            pp_t = AudioNaFlexPatchify(acfg, max_audio_tokens=naflex_audio_eval_seq_len(acfg))
            return model, pp_t, pp_t
        from .data.audio import audio_transform_v2

        return (model,
                audio_transform_v2(model.cfg.audio_cfg, is_train=True, audio_aug_cfg=aug_cfg),
                audio_transform_v2(model.cfg.audio_cfg, is_train=False))
    pp = model._preprocess_cfg
    pp = merge_preprocess_dict(
        pp,
        {
            "mean": image_mean,
            "std": image_std,
            "interpolation": image_interpolation,
            "resize_mode": image_resize_mode,
        },
    )
    model._preprocess_cfg = pp
    train_t = image_transform_v2(pp, is_train=True, aug_cfg=aug_cfg)
    val_t = image_transform_v2(pp, is_train=False)
    return model, train_t, val_t


def create_model_from_pretrained(
    model_name: str,
    pretrained: Optional[str] = None,
    *,
    return_transform: bool = True,
    **kwargs,
):
    """(model[, preprocess]) for inference — reference factory.py:1217-1334."""
    model = create_model(model_name, pretrained, require_pretrained=True, **kwargs)
    if not return_transform:
        return model
    val_t = image_transform_v2(model._preprocess_cfg, is_train=False)
    return model, val_t


def load_checkpoint(model: CLIPModel, path: str, strict: bool = True) -> CLIPModel:
    """Load reference-format weights into an existing model in place."""
    model.params = _load_checkpoint_into(model.params, model.cfg, path, strict=strict)
    return model


def get_tokenizer(
    model_name: str = "",
    context_length: Optional[int] = None,
    cache_dir: Optional[str] = None,
    **kwargs,
):
    """Resolve the tokenizer for a model config (reference factory.py:746-927)."""
    raw = None
    if model_name.startswith(HF_HUB_PREFIX):
        # prefer the repo's open_clip_config.json text_cfg; fall back to the repo's
        # own HF tokenizer when the config isn't available
        import json

        model_id = "/".join(model_name[len(HF_HUB_PREFIX):].split("/")[:2])
        try:
            from huggingface_hub import hf_hub_download

            with open(hf_hub_download(model_id, "open_clip_config.json",
                                      cache_dir=cache_dir)) as fh:
                raw = json.load(fh).get("model_cfg")
        except Exception:  # noqa: BLE001 — config-less repos use their HF tokenizer
            return HFTokenizer(
                model_id, context_length=context_length or DEFAULT_CONTEXT_LENGTH,
                cache_dir=cache_dir, **kwargs,
            )
    elif model_name:
        raw = get_model_config(model_name)
    text_cfg: Dict[str, Any] = (raw or {}).get("text_cfg", {})
    tok_kwargs = dict(text_cfg.get("tokenizer_kwargs", {}))
    tok_kwargs.update(kwargs)
    if context_length is None:
        context_length = text_cfg.get("context_length", DEFAULT_CONTEXT_LENGTH)

    if text_cfg.get("tokenizer_type"):
        ttype = text_cfg["tokenizer_type"]
        if ttype == "tiktoken":
            from .tokenizer import TikTokenTokenizer

            tok = TikTokenTokenizer(
                text_cfg.get("tiktoken_name", "cl100k_base"), context_length=context_length, **tok_kwargs
            )
        elif ttype == "siglip":
            from .tokenizer import SigLipTokenizer

            tok = SigLipTokenizer(text_cfg["hf_tokenizer_name"], context_length=context_length)
        else:
            raise NotImplementedError(f"tokenizer_type {ttype!r} not supported")
    elif text_cfg.get("hf_tokenizer_name"):
        tok = HFTokenizer(
            text_cfg["hf_tokenizer_name"], context_length=context_length, cache_dir=cache_dir, **tok_kwargs
        )
    else:
        tok = SimpleTokenizer(context_length=context_length, **tok_kwargs)
    validate_special_tokens(text_cfg, tok)
    return tok


def validate_special_tokens(text_cfg: Dict[str, Any], tokenizer) -> None:
    """Fail fast when a config's special-token ids disagree with the resolved tokenizer
    (reference _validate_special_tokens, factory.py:705-744): a wrong eos_id pools the
    wrong positions silently; a drifting pad_id corrupts pad masks silently."""
    pool_type = text_cfg.get("pool_type", "argmax")
    uses_eos = pool_type == "eos" or (text_cfg.get("text_arch") == "modern" and pool_type == "argmax")
    if uses_eos:
        eos_id = text_cfg.get("eos_id")
        if eos_id is None:
            raise ValueError(
                "pool_type='eos' requires text_cfg.eos_id (must match the tokenizer eos/eot id)")
        tok_eos = getattr(tokenizer, "eot_token_id", None)
        if tok_eos is not None and int(tok_eos) != int(eos_id):
            raise ValueError(
                f"text_cfg.eos_id ({eos_id}) != tokenizer eos/eot id ({tok_eos}); "
                "eos pooling would index the wrong positions")
    tok_pad = getattr(tokenizer, "pad_token_id", None)
    if text_cfg.get("variable_text", False) and tok_pad is None:
        raise ValueError("variable_text=True requires a tokenizer with a reserved pad_token_id")
    pad_id = text_cfg.get("pad_id")
    if pad_id is not None and tok_pad is not None and int(tok_pad) != int(pad_id):
        raise ValueError(
            f"text_cfg.pad_id ({pad_id}) != tokenizer pad id ({tok_pad}); "
            "pad masks and padding would disagree")
