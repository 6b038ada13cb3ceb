"""Pretrained-weight registry and download helpers.

Behavioral equivalent of reference ``src/open_clip/pretrained.py``: a registry mapping
``(model, tag)`` -> hub location + preprocess overrides, preferring safetensors. The
full table (~119 model families, 200 tags, reference pretrained.py:456-768) is carried
as data in ``pretrained_data.json``; entries split ``hf_hub``/``url`` from the
preprocess-override dict. Local file paths always work without the registry.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from .constants import HF_SAFE_WEIGHTS_NAME, HF_WEIGHTS_NAME

_DATA_PATH = os.path.join(os.path.dirname(__file__), "pretrained_data.json")

with open(_DATA_PATH) as _fh:
    _PRETRAINED: Dict[str, Dict[str, Dict[str, Any]]] = json.load(_fh)

# tuple-ify mean/std so downstream dataclasses hash/compare cleanly
for _tags in _PRETRAINED.values():
    for _cfg_entry in _tags.values():
        _pp = _cfg_entry.get("preprocess_cfg", {})
        for _k in ("mean", "std"):
            if isinstance(_pp.get(_k), list):
                _pp[_k] = tuple(_pp[_k])


def register_pretrained(model: str, tag: str, cfg: Dict[str, Any]) -> None:
    """Add/override a registry entry at runtime (mirror of editing _PRETRAINED)."""
    _PRETRAINED.setdefault(model, {})[tag.lower()] = cfg


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
        # registry form is "org/repo/" or "org/repo/filename"
        parts = hf_hub.rstrip("/").split("/")
        repo = "/".join(parts[:2])
        fname = parts[2] if len(parts) > 2 else None
        return download_pretrained_from_hf(repo, filename=fname, cache_dir=cache_dir)
    url = cfg.get("url", "")
    if url:
        return download_pretrained_from_url(url, cache_dir=cache_dir)
    raise ValueError("pretrained cfg has no hf_hub or url")


def download_pretrained_from_url(url: str, cache_dir: Optional[str] = None) -> str:
    """Fetch a checkpoint URL into the cache with the registry's embedded-sha256
    verification (reference pretrained.py:812-856: openaipublic URLs carry the
    hash as the parent path segment, mlfoundations releases as the filename
    suffix). A cached file with a matching hash short-circuits the download, so
    offline hosts with a primed cache never touch the network."""
    import hashlib
    import urllib.request
    import warnings

    if not cache_dir:
        cache_dir = os.path.expanduser("~/.cache/clip")
    os.makedirs(cache_dir, exist_ok=True)
    filename = os.path.basename(url)
    if "openaipublic" in url:
        expected_sha256 = url.split("/")[-2]
    elif "mlfoundations" in url:
        expected_sha256 = os.path.splitext(filename)[0].split("-")[-1]
    else:
        expected_sha256 = ""
    target = os.path.join(cache_dir, filename)
    if os.path.exists(target) and not os.path.isfile(target):
        raise RuntimeError(f"{target} exists and is not a regular file")
    if os.path.isfile(target):
        if not expected_sha256:
            return target
        digest = hashlib.sha256(open(target, "rb").read()).hexdigest()
        if digest.startswith(expected_sha256):
            return target
        warnings.warn(f"{target} exists but the SHA256 does not match; re-downloading")
    tmp = target + ".part"
    with urllib.request.urlopen(url) as src, open(tmp, "wb") as out:
        while True:
            buf = src.read(1 << 20)
            if not buf:
                break
            out.write(buf)
    if expected_sha256:
        digest = hashlib.sha256(open(tmp, "rb").read()).hexdigest()
        if not digest.startswith(expected_sha256):
            os.unlink(tmp)
            raise RuntimeError("downloaded checkpoint failed SHA256 verification")
    os.replace(tmp, target)  # atomic publish: no torn files on crash
    return target


def download_pretrained_from_hf(
    repo_id: str,
    filename: Optional[str] = None,
    cache_dir: Optional[str] = None,
) -> str:
    """HF-hub download preferring safetensors (reference pretrained.py:879-914)."""
    from huggingface_hub import hf_hub_download

    candidates = ([filename] if filename else []) + [
        HF_SAFE_WEIGHTS_NAME, "model.safetensors", HF_WEIGHTS_NAME, "pytorch_model.bin",
    ]
    last_err = None
    for fname in candidates:
        try:
            return hf_hub_download(repo_id, fname, cache_dir=cache_dir)
        except Exception as e:  # noqa: BLE001 — iterate filename candidates
            last_err = e
    raise RuntimeError(
        f"could not download weights from hf hub repo {repo_id!r} "
        f"(offline environment? pass a local checkpoint path instead): {last_err}"
    )
