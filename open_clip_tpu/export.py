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

__all__ = ["export_encoders", "export_captioner", "save_exported", "load_exported",
           "LoadedCLIP"]


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


def export_captioner(model, *, seq_len: int = 30, min_seq_len: int = 5,
                     generation_type: str = "beam", num_beams: int = 6,
                     temperature: float = 1.0, top_k: int = 1, top_p: float = 0.1,
                     static_batch: Optional[int] = None,
                     image_tokens: Optional[int] = None, **gen_kw):
    """Export the KV-cached caption decoder as one StableHLO program: the whole
    fixed-shape decode loop (vision tower + cached text/decoder steps + sampling)
    compiles into a single artifact callable as ``ids = exported.call(image, seed)``.

    Works for CoCa models (standard image input) and GenLIP models (NaFlex patch
    dict; pass ``image_tokens`` to pin the patch-sequence length). ``seed`` feeds the
    sampled generation types and is ignored by greedy/beam."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    cfg = model.cfg
    params = model.params
    compute_dtype = model.compute_dtype

    if static_batch is not None:
        b = int(static_batch)
    else:
        (b,) = jexport.symbolic_shape("b")

    if getattr(cfg, "multimodal_cfg", None) is not None:  # CoCa
        from .models import coca

        size = cfg.vision_cfg.image_size
        h, w = (int(size[0]), int(size[1])) if isinstance(size, (tuple, list)) \
            else (int(size), int(size))

        def fn(image, seed):
            rng = jax.random.PRNGKey(seed)
            if generation_type == "beam":
                return coca.generate_beam(
                    params, cfg, image, seq_len=seq_len, min_seq_len=min_seq_len,
                    num_beams=num_beams, compute_dtype=compute_dtype, **gen_kw)
            return coca.generate(
                params, cfg, image, rng, seq_len=seq_len, min_seq_len=min_seq_len,
                generation_type=generation_type, temperature=temperature,
                top_k=top_k, top_p=top_p, compute_dtype=compute_dtype, **gen_kw)

        specs = (jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32),
                 jax.ShapeDtypeStruct((), jnp.uint32))
        return jexport.export(jax.jit(fn))(*specs)

    if hasattr(cfg, "trunk_cfg"):  # GenLIP
        from .models import genlip as G

        if image_tokens is None:
            raise ValueError("GenLIP captioner export needs image_tokens "
                             "(the NaFlex patch-sequence length to serve)")
        pdim = cfg.vision_cfg.patch_size * cfg.vision_cfg.patch_size * 3

        def gfn(patches, patch_coord, patch_valid, seed):
            rng = jax.random.PRNGKey(seed)
            image = {"patches": patches, "patch_coord": patch_coord,
                     "patch_valid": patch_valid}
            return G.generate(
                params, cfg, image, rng, seq_len=seq_len, min_seq_len=min_seq_len,
                generation_type="greedy" if generation_type == "beam" else generation_type,
                temperature=temperature, top_k=top_k, top_p=top_p,
                compute_dtype=compute_dtype, **gen_kw)

        ni = int(image_tokens)
        specs = (jax.ShapeDtypeStruct((b, ni, pdim), jnp.float32),
                 jax.ShapeDtypeStruct((b, ni, 2), jnp.int32),
                 jax.ShapeDtypeStruct((b, ni), jnp.bool_),
                 jax.ShapeDtypeStruct((), jnp.uint32))
        return jexport.export(jax.jit(gfn))(*specs)

    raise ValueError("export_captioner supports CoCa and GenLIP models")


def save_exported(model, path: str, *, normalize: bool = True,
                  static_batch: Optional[int] = None,
                  preprocess_cfg: Optional[Dict[str, Any]] = None,
                  captioner: Optional[Dict[str, Any]] = None) -> str:
    """Export ``model``'s encoders and write the serving artifact directory.

    For CoCa models a ``captioner.jaxexp`` (the whole KV-cached decode loop as one
    StableHLO program) is written as well; ``captioner`` passes options through to
    :func:`export_captioner` (e.g. ``{"seq_len": 30, "generation_type": "beam"}``) —
    pass ``{}``/None for the defaults or ``{"skip": True}`` to omit it."""
    import jax

    exported = export_encoders(model, normalize=normalize, static_batch=static_batch)
    os.makedirs(path, exist_ok=True)
    for name, exp in (("image_encoder", exported["image"]), ("text_encoder", exported["text"])):
        with open(os.path.join(path, f"{name}.jaxexp"), "wb") as fh:
            fh.write(bytes(exp.serialize()))

    captioner_meta = None
    if getattr(model.cfg, "multimodal_cfg", None) is not None and \
            not (captioner or {}).get("skip"):
        cap_kw = dict(captioner or {})
        cap_kw.pop("skip", None)
        cap_kw.setdefault("static_batch", static_batch)
        cap = export_captioner(model, **cap_kw)
        with open(os.path.join(path, "captioner.jaxexp"), "wb") as fh:
            fh.write(bytes(cap.serialize()))
        captioner_meta = {"seq_len": cap_kw.get("seq_len", 30),
                          "generation_type": cap_kw.get("generation_type", "beam"),
                          "num_beams": cap_kw.get("num_beams", 6)}

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
        "captioner": captioner_meta,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(path, "export_config.json"), "w") as fh:
        json.dump(meta, fh, indent=1)
    return path


class LoadedCLIP:
    """Deserialized serving artifact: ``encode_image`` / ``encode_text`` /
    ``get_logits`` over the exported StableHLO modules — no model code involved."""

    def __init__(self, image_exp, text_exp, meta: Dict[str, Any], captioner_exp=None):
        self._image = image_exp
        self._text = text_exp
        self._captioner = captioner_exp
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

    def generate(self, image, seed: int = 0):
        """Caption a batch through the exported decode loop (CoCa artifacts)."""
        if self._captioner is None:
            raise ValueError("artifact has no captioner.jaxexp (not a CoCa export?)")
        import jax.numpy as jnp

        return self._captioner.call(jnp.asarray(image, jnp.float32),
                                    jnp.uint32(seed))


def load_exported(path: str) -> LoadedCLIP:
    from jax import export as jexport

    with open(os.path.join(path, "export_config.json")) as fh:
        meta = json.load(fh)
    exps = {}
    for name in ("image_encoder", "text_encoder"):
        with open(os.path.join(path, f"{name}.jaxexp"), "rb") as fh:
            exps[name] = jexport.deserialize(bytearray(fh.read()))
    cap = None
    cap_path = os.path.join(path, "captioner.jaxexp")
    if os.path.exists(cap_path):
        with open(cap_path, "rb") as fh:
            cap = jexport.deserialize(bytearray(fh.read()))
    return LoadedCLIP(exps["image_encoder"], exps["text_encoder"], meta, cap)
