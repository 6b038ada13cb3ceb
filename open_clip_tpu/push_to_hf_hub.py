"""HF Hub export (reference ``src/open_clip/push_to_hf_hub.py``).

``save_for_hf`` writes the reference-compatible artifact set — ``open_clip_config.json``
+ ``open_clip_model.safetensors`` in the reference's torch state-dict layout (via the
reverse converter) — so models trained here load directly in the torch reference.
``push_to_hf_hub`` uploads the folder (needs hub credentials/network).
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Any, Dict, Optional

from .constants import HF_CONFIG_NAME, HF_SAFE_WEIGHTS_NAME


def save_for_hf(
    model,
    save_directory: str,
    *,
    model_config: Optional[Dict[str, Any]] = None,
    preprocess_cfg: Optional[Dict[str, Any]] = None,
    tokenizer=None,
) -> str:
    """Write config + safetensors (+ tokenizer) — reference push_to_hf_hub.py:58-84."""
    from safetensors.numpy import save_file

    from .convert import params_to_torch_state_dict

    d = Path(save_directory)
    d.mkdir(parents=True, exist_ok=True)

    import numpy as np

    sd = params_to_torch_state_dict(model.params, custom_text=True)
    # safetensors serializes the raw buffer; transposed views must be made contiguous
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, str(d / HF_SAFE_WEIGHTS_NAME))

    if model_config is None:
        model_config = model.cfg.to_dict() if hasattr(model.cfg, "to_dict") else dataclasses.asdict(model.cfg)
    if preprocess_cfg is None and getattr(model, "_preprocess_cfg", None) is not None:
        preprocess_cfg = dataclasses.asdict(model._preprocess_cfg)
    hub_cfg = {"model_cfg": model_config, "preprocess_cfg": preprocess_cfg or {}}
    with open(d / HF_CONFIG_NAME, "w") as fh:
        json.dump(hub_cfg, fh, indent=2)

    if tokenizer is not None and hasattr(tokenizer, "save_pretrained"):
        tokenizer.save_pretrained(str(d))
    return str(d)


def push_to_hf_hub(
    model,
    repo_id: str,
    *,
    commit_message: str = "Add model",
    private: bool = False,
    token: Optional[str] = None,
    **save_kwargs,
):
    """Upload the saved folder to the hub (reference push_to_hf_hub.py:85-155)."""
    import tempfile

    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(repo_id, private=private, exist_ok=True)
    with tempfile.TemporaryDirectory() as tmp:
        save_for_hf(model, tmp, **save_kwargs)
        return api.upload_folder(repo_id=repo_id, folder_path=tmp, commit_message=commit_message)


def push_pretrained_to_hf_hub(
    model_name: str,
    pretrained: str,
    repo_id: str,
    *,
    precision: str = "fp32",
    image_mean=None,
    image_std=None,
    image_interpolation: Optional[str] = None,
    image_resize_mode: Optional[str] = None,
    **push_kwargs,
):
    """Build a model from a pretrained tag and push it (reference
    push_to_hf_hub.py:156-213): resolves the checkpoint through the registry,
    applies preprocess overrides, then uploads config + weights."""
    from .factory import create_model

    model = create_model(model_name, pretrained=pretrained, precision=precision,
                         require_pretrained=True)
    pc = dict(model._preprocess_cfg.__dict__) if model._preprocess_cfg else {}
    for k, v in (("mean", image_mean), ("std", image_std),
                 ("interpolation", image_interpolation), ("resize_mode", image_resize_mode)):
        if v is not None:
            pc[k] = v
    return push_to_hf_hub(model, repo_id, preprocess_cfg=pc, **push_kwargs)
