"""Shared helpers for the user-facing scripts (reference scripts/*.py load_weights).

Loads trained weights into a model facade from either of our checkpoint forms:

- a native Orbax checkpoint directory written by ``open_clip_tpu.checkpoint.save_native``
  (a raw param tree or a full TrainState; ``--use-ema`` picks ``ema_params`` when present);
- a torch-format file (``.pt`` / ``.safetensors`` / ``.npz``) in the reference layout,
  optionally nested in a task checkpoint (``state_dict`` / ``state_dict_ema``) with
  ``module.`` / ``_orig_mod.`` / ``trainable_module.`` prefixes
  (reference scripts/genlip_zeroshot.py:43-66).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import jax

_STRIP_PREFIXES = ("module.", "_orig_mod.", "trainable_module.")


def _strip_prefix(key: str) -> str:
    changed = True
    while changed:
        changed = False
        for prefix in _STRIP_PREFIXES:
            if key.startswith(prefix):
                key = key[len(prefix):]
                changed = True
    return key


def _read_torch_state_dict(path: str, use_ema: bool) -> Dict[str, Any]:
    """torch.load + descend task wrappers + strip DDP/compile prefixes."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import numpy as np

    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    while isinstance(obj, dict):
        if use_ema and isinstance(obj.get("state_dict_ema"), dict):
            obj = obj["state_dict_ema"]
            continue
        if isinstance(obj.get("state_dict"), dict):
            obj = obj["state_dict"]
            continue
        break
    return {_strip_prefix(k): v for k, v in obj.items() if torch.is_tensor(v)}


def load_trained_weights(model, path: str, use_ema: bool = False) -> None:
    """Load trained weights into ``model`` (a CLIPModel/GenLipModel/GenLapModel facade)
    in place, from a native Orbax dir or a torch-format checkpoint file."""
    if os.path.isdir(path):
        from open_clip_tpu.checkpoint import load_native

        tree = load_native(path)
        if isinstance(tree, dict) and ("params" in tree or "ema_params" in tree):
            ema = tree.get("ema_params")
            if use_ema and ema:  # None / empty node when the run had no EMA
                tree = ema
            else:
                tree = tree["params"]
        model.params = jax.tree.map(jnp.asarray, tree)
        print(f"Loaded native checkpoint {path} (ema={use_ema}).")
        return

    sd = _read_torch_state_dict(path, use_ema)
    cfg = model.cfg
    if hasattr(cfg, "trunk_cfg"):  # GenLIP / GenLAP
        if getattr(cfg, "audio_cfg", None) is not None:
            from open_clip_tpu.models.genlap import torch_genlap_to_params

            model.params = torch_genlap_to_params(sd, cfg)
        else:
            from open_clip_tpu.models.genlip import torch_genlip_to_params

            model.params = torch_genlip_to_params(sd, cfg)
    else:
        model.params = _merge_torch(model, sd)
    print(f"Loaded {len(sd)} tensors from {path} (ema={use_ema}).")


def _merge_torch(model, sd) -> Dict[str, Any]:
    """Convert + merge a reference-layout state dict into the model's params."""
    from open_clip_tpu.checkpoint import merge_params

    cfg = model.cfg
    if getattr(cfg, "audio_cfg", None) is not None:
        from open_clip_tpu.models.clap import hf_clap_to_params, torch_clap_to_params

        if any(k.startswith(("audio_model.", "audio_projection.")) for k in sd):
            loaded = hf_clap_to_params(sd, cfg)
        else:
            loaded = torch_clap_to_params(sd, cfg)
    else:
        from open_clip_tpu.convert import torch_clip_to_params

        loaded = torch_clip_to_params(sd, cfg)
    loaded.pop("_unconverted", None)
    return merge_params(model.params, loaded, cfg, strict=False)
