"""Pretrained-weight registry and download helpers.

Behavioral equivalent of reference ``src/open_clip/pretrained.py``: a registry mapping
``(model, tag)`` -> hub location + preprocess overrides, preferring safetensors. The
full ~120-family table is grown lazily; the highest-traffic families (openai, laion2b,
datacomp) are registered here. Local file paths always work without the registry.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

from .constants import (
    HF_SAFE_WEIGHTS_NAME,
    HF_WEIGHTS_NAME,
    IMAGENET_MEAN,
    IMAGENET_STD,
    INCEPTION_MEAN,
    INCEPTION_STD,
    OPENAI_DATASET_MEAN,
    OPENAI_DATASET_STD,
)


def _cfg(hf_hub: str = "", url: str = "", **kw) -> Dict[str, Any]:
    pp = {
        "mean": OPENAI_DATASET_MEAN,
        "std": OPENAI_DATASET_STD,
        "interpolation": "bicubic",
        "resize_mode": "shortest",
    }
    pp.update(kw)
    out = {"preprocess_cfg": pp}
    if hf_hub:
        out["hf_hub"] = hf_hub if hf_hub.endswith("/") else hf_hub + "/"
    if url:
        out["url"] = url
    return out


_PRETRAINED: Dict[str, Dict[str, Dict[str, Any]]] = {
    "ViT-B-32": {
        "openai": _cfg(hf_hub="timm/vit_base_patch32_clip_224.openai", quick_gelu=True),
        "laion400m_e31": _cfg(hf_hub="timm/vit_base_patch32_clip_224.laion400m_e31", quick_gelu=True),
        "laion400m_e32": _cfg(hf_hub="timm/vit_base_patch32_clip_224.laion400m_e32", quick_gelu=True),
        "laion2b_e16": _cfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-e16", quick_gelu=True),
        "laion2b_s34b_b79k": _cfg(hf_hub="laion/CLIP-ViT-B-32-laion2B-s34B-b79K"),
        "datacomp_xl_s13b_b90k": _cfg(hf_hub="laion/CLIP-ViT-B-32-DataComp.XL-s13B-b90K"),
    },
    "ViT-B-16": {
        "openai": _cfg(hf_hub="timm/vit_base_patch16_clip_224.openai", quick_gelu=True),
        "laion400m_e31": _cfg(hf_hub="timm/vit_base_patch16_clip_224.laion400m_e31", quick_gelu=True),
        "laion400m_e32": _cfg(hf_hub="timm/vit_base_patch16_clip_224.laion400m_e32", quick_gelu=True),
        "laion2b_s34b_b88k": _cfg(hf_hub="laion/CLIP-ViT-B-16-laion2B-s34B-b88K"),
        "datacomp_xl_s13b_b90k": _cfg(hf_hub="laion/CLIP-ViT-B-16-DataComp.XL-s13B-b90K"),
    },
    "ViT-L-14": {
        "openai": _cfg(hf_hub="timm/vit_large_patch14_clip_224.openai", quick_gelu=True),
        "laion400m_e31": _cfg(hf_hub="timm/vit_large_patch14_clip_224.laion400m_e31", quick_gelu=True),
        "laion400m_e32": _cfg(hf_hub="timm/vit_large_patch14_clip_224.laion400m_e32", quick_gelu=True),
        "laion2b_s32b_b82k": _cfg(
            hf_hub="laion/CLIP-ViT-L-14-laion2B-s32B-b82K", mean=INCEPTION_MEAN, std=INCEPTION_STD
        ),
        "datacomp_xl_s13b_b90k": _cfg(hf_hub="laion/CLIP-ViT-L-14-DataComp.XL-s13B-b90K"),
    },
    "ViT-L-14-336": {
        "openai": _cfg(hf_hub="timm/vit_large_patch14_clip_336.openai", quick_gelu=True),
    },
    "ViT-H-14": {
        "laion2b_s32b_b79k": _cfg(hf_hub="laion/CLIP-ViT-H-14-laion2B-s32B-b79K"),
    },
    "ViT-g-14": {
        "laion2b_s12b_b42k": _cfg(hf_hub="laion/CLIP-ViT-g-14-laion2B-s12B-b42K"),
        "laion2b_s34b_b88k": _cfg(hf_hub="laion/CLIP-ViT-g-14-laion2B-s34B-b88K"),
    },
    "ViT-bigG-14": {
        "laion2b_s39b_b160k": _cfg(hf_hub="laion/CLIP-ViT-bigG-14-laion2B-39B-b160k"),
    },
    "RN50": {
        "openai": _cfg(hf_hub="timm/resnet50_clip.openai", quick_gelu=True),
    },
    "RN101": {
        "openai": _cfg(hf_hub="timm/resnet101_clip.openai", quick_gelu=True),
    },
    "coca_ViT-B-32": {
        "laion2b_s13b_b90k": _cfg(hf_hub="laion/CoCa-ViT-B-32-laion2B-s13B-b90k"),
    },
    "coca_ViT-L-14": {
        "laion2b_s13b_b90k": _cfg(hf_hub="laion/CoCa-ViT-L-14-laion2B-s13B-b90k"),
    },
}


def list_pretrained(as_str: bool = False) -> List:
    """All (model, tag) pairs (reference pretrained.py:769-776)."""
    out = [(m, t) for m in _PRETRAINED for t in _PRETRAINED[m]]
    return [f"{m}.{t}" for m, t in out] if as_str else out


def list_pretrained_models_by_tag(tag: str) -> List[str]:
    return [m for m in _PRETRAINED if tag.lower() in _PRETRAINED[m]]


def list_pretrained_tags_by_model(model: str) -> List[str]:
    return list(_PRETRAINED.get(model, {}))


def is_pretrained_cfg(model: str, tag: str) -> bool:
    return tag.lower() in _PRETRAINED.get(model, {})


def get_pretrained_cfg(model: str, tag: str) -> Dict[str, Any]:
    return dict(_PRETRAINED.get(model, {}).get(tag.lower(), {}))


def get_pretrained_url(model: str, tag: str) -> str:
    return get_pretrained_cfg(model, tag).get("url", "")


def download_pretrained(cfg: Dict[str, Any], cache_dir: Optional[str] = None) -> str:
    """Fetch checkpoint to local path (HF hub preferred, safetensors first)."""
    hf_hub = cfg.get("hf_hub", "")
    if hf_hub:
        from huggingface_hub import hf_hub_download

        repo = hf_hub.rstrip("/")
        last_err = None
        for fname in (HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME, "model.safetensors", "pytorch_model.bin"):
            try:
                return hf_hub_download(repo, fname, cache_dir=cache_dir)
            except Exception as e:  # noqa: BLE001 — iterate filename candidates
                last_err = e
        raise RuntimeError(
            f"could not download weights from hf hub repo {repo!r} "
            f"(offline environment? pass a local checkpoint path instead): {last_err}"
        )
    url = cfg.get("url", "")
    if url:
        raise RuntimeError(
            f"URL download not available in this environment; fetch {url} manually and "
            "pass the local path as `pretrained=`."
        )
    raise ValueError("pretrained cfg has no hf_hub or url")
