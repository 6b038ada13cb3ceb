"""Serving export: CLIP encoders as portable StableHLO artifacts.

TPU-native deployment path with no reference equivalent (the reference serves
through torch/`torch.jit`): ``jax.export`` lowers the jitted encoders once to
StableHLO with the weights baked in as constants, producing a self-contained
artifact that any PJRT runtime (TPU serving binary, C++ loader, another JAX
process — no Python model code, no checkpoint plumbing) can load and call.
Batch size is exported symbolically, so one artifact serves every batch size.

Layout of an export directory::

    <dir>/image_encoder.jaxexp   serialized jax.export.Exported (StableHLO + vjp-less)
    <dir>/text_encoder.jaxexp
    <dir>/export_config.json     {model name?, embed_dim, image_size, context_length,
                                  mean/std, logit_scale, jax/export versions}

Use :func:`save_exported` / :func:`load_exported` for the directory form, or
:func:`export_encoders` to get the in-memory ``Exported`` objects.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["export_encoders", "save_exported", "load_exported", "LoadedCLIP"]


def export_encoders(model, *, normalize: bool = True, static_batch: Optional[int] = None):
    """Export a :class:`~open_clip_tpu.models.clip.CLIPModel`'s encoders.

    Returns ``{"image": Exported, "text": Exported}``. Weights are baked into
    the modules as constants; the batch dimension is symbolic unless
    ``static_batch`` pins it (pin it for serving stacks that want one fixed
    shape; leave symbolic for bucketed batchers).
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from .models.clip import _is_naflex, encode_image, encode_text

    cfg = model.cfg
    params = model.params
    compute_dtype = model.compute_dtype
    if (cfg.vision_cfg is None or getattr(cfg.vision_cfg, "image_size", None) is None
            or _is_naflex(cfg.vision_cfg) or getattr(cfg, "audio_cfg", None) is not None):
        raise ValueError("export_encoders supports standard image towers "
                         "(audio/NaFlex patch-dict inputs have no fixed input spec)")

    size = cfg.vision_cfg.image_size
    if isinstance(size, (tuple, list)):
        h, w = int(size[0]), int(size[1])
    else:
        h = w = int(size)
    ctx = int(cfg.text_cfg.context_length) if cfg.text_cfg is not None else 77

    if static_batch is not None:
        b = int(static_batch)
    else:
        (b,) = jexport.symbolic_shape("b")

    def img_fn(image):
        return encode_image(params, cfg, image, normalize=normalize,
                            compute_dtype=compute_dtype)

    def txt_fn(text):
        return encode_text(params, cfg, text, normalize=normalize,
                           compute_dtype=compute_dtype)

    image_spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    text_spec = jax.ShapeDtypeStruct((b, ctx), jnp.int32)
    return {
        "image": jexport.export(jax.jit(img_fn))(image_spec),
        "text": jexport.export(jax.jit(txt_fn))(text_spec),
    }


def save_exported(model, path: str, *, normalize: bool = True,
                  static_batch: Optional[int] = None,
                  preprocess_cfg: Optional[Dict[str, Any]] = None) -> str:
    """Export ``model``'s encoders and write the serving artifact directory."""
    import jax

    exported = export_encoders(model, normalize=normalize, static_batch=static_batch)
    os.makedirs(path, exist_ok=True)
    for name, exp in (("image_encoder", exported["image"]), ("text_encoder", exported["text"])):
        with open(os.path.join(path, f"{name}.jaxexp"), "wb") as fh:
            fh.write(bytes(exp.serialize()))

    pc = preprocess_cfg
    if pc is None and getattr(model, "_preprocess_cfg", None) is not None:
        import dataclasses

        pc = dataclasses.asdict(model._preprocess_cfg)
    meta = {
        "embed_dim": int(model.cfg.embed_dim),
        "image_size": model.cfg.vision_cfg.image_size,
        "context_length": int(model.cfg.text_cfg.context_length)
        if model.cfg.text_cfg is not None else 77,
        "normalize": normalize,
        "static_batch": static_batch,
        "logit_scale": float(np.exp(np.asarray(model.params["logit_scale"], np.float32))),
        "preprocess_cfg": pc,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(path, "export_config.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return path


class LoadedCLIP:
    """Deserialized serving artifact: ``encode_image`` / ``encode_text`` /
    ``get_logits`` over the exported StableHLO modules — no model code involved."""

    def __init__(self, image_exp, text_exp, meta: Dict[str, Any]):
        self._image = image_exp
        self._text = text_exp
        self.meta = meta
        self.logit_scale = float(meta.get("logit_scale", 1.0))

    def encode_image(self, image):
        import jax.numpy as jnp

        return self._image.call(jnp.asarray(image, jnp.float32))

    def encode_text(self, text):
        import jax.numpy as jnp

        return self._text.call(jnp.asarray(text, jnp.int32))

    def get_logits(self, image, text):
        import jax.numpy as jnp

        fi = jnp.asarray(self.encode_image(image), jnp.float32)
        ft = jnp.asarray(self.encode_text(text), jnp.float32)
        logits = self.logit_scale * fi @ ft.T
        return logits, logits.T


def load_exported(path: str) -> LoadedCLIP:
    from jax import export as jexport

    with open(os.path.join(path, "export_config.json")) as fh:
        meta = json.load(fh)
    exps = {}
    for name in ("image_encoder", "text_encoder"):
        with open(os.path.join(path, f"{name}.jaxexp"), "rb") as fh:
            exps[name] = jexport.deserialize(bytearray(fh.read()))
    return LoadedCLIP(exps["image_encoder"], exps["text_encoder"], meta)
