"""CLIP / CustomTextCLIP container — TPU-native.

Functional re-design of reference ``src/open_clip/model.py:318-737``. A single
parameter pytree holds both towers:

    params = {"visual": {...}, "text": {...}, "logit_scale": (), ["logit_bias": ()]}

The reference's CLIP-vs-CustomTextCLIP split (text attrs flattened onto the module vs a
``text`` submodule) is purely a torch state-dict layout concern; here both map to the same
tree and the checkpoint converter handles either torch layout (see convert.py).

A thin ``CLIPModel`` facade offers jitted ``encode_image`` / ``encode_text`` / ``get_logits``
matching the reference's public model API (model.py:396-550).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPModelCfg
from . import vit, text as text_mod

DEFAULT_LOGIT_SCALE = math.log(1.0 / 0.07)
LOGIT_SCALE_MAX = math.log(100.0)


def init_clip(key, cfg: CLIPModelCfg) -> Dict[str, Any]:
    if cfg.audio_cfg is not None:
        from . import clap

        return clap.init_clap(key, cfg)
    kv, kt = jax.random.split(key)
    params: Dict[str, Any] = {}
    if cfg.vision_cfg is not None:
        if _is_naflex(cfg.vision_cfg):
            from . import naflex_vit

            ncfg = naflex_vit.parse_naflex_cfg(cfg.vision_cfg)
            params["visual"] = naflex_vit.init_naflex_vit(kv, ncfg, cfg.embed_dim)
        elif cfg.vision_cfg.is_resnet:
            from . import resnet

            params["visual"] = resnet.init_modified_resnet(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_convnext(cfg.vision_cfg):
            from . import convnext

            params["visual"] = convnext.init_convnext(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_eva(cfg.vision_cfg):
            from . import eva

            params["visual"] = eva.init_eva(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_fastvit(cfg.vision_cfg):
            from . import fastvit

            params["visual"] = fastvit.init_fastvit(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_vitamin(cfg.vision_cfg):
            from . import vitamin

            params["visual"] = vitamin.init_vitamin(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_swin(cfg.vision_cfg):
            from . import swin

            params["visual"] = swin.init_swin(kv, cfg.vision_cfg, cfg.embed_dim)
        elif _is_relpos(cfg.vision_cfg):
            from . import relpos_vit

            params["visual"] = relpos_vit.init_relpos_vit(kv, cfg.vision_cfg, cfg.embed_dim)
        else:
            params["visual"] = vit.init_vision_tower(kv, cfg.vision_cfg, cfg.embed_dim)
    if cfg.text_cfg is not None:
        if cfg.text_cfg.hf_model_name or cfg.text_cfg.hf_model_config:
            from . import hf_text

            params["text"] = hf_text.init_hf_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
        elif cfg.text_cfg.text_arch == "modern":
            from . import modern_text

            params["text"] = modern_text.init_modern_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
        else:
            params["text"] = text_mod.init_text_tower(kt, cfg.text_cfg, cfg.embed_dim)
    if cfg.multimodal_cfg is not None:
        from . import coca

        kd = jax.random.fold_in(key, 2)
        params["text_decoder"] = coca.init_multimodal_decoder(
            kd, cfg.multimodal_cfg, cfg.text_cfg.vocab_size
        )
    scale_init = cfg.init_logit_scale if cfg.init_logit_scale is not None else DEFAULT_LOGIT_SCALE
    params["logit_scale"] = jnp.asarray(scale_init, dtype=jnp.float32)
    if cfg.init_logit_bias is not None:
        params["logit_bias"] = jnp.asarray(cfg.init_logit_bias, dtype=jnp.float32)
    return params


def _act_name(cfg: CLIPModelCfg) -> str:
    return "quick_gelu" if cfg.quick_gelu else "gelu"


def _is_naflex(vision_cfg) -> bool:
    return bool(vision_cfg.timm_model_name) and vision_cfg.timm_model_name.startswith("naflexvit")


def _is_convnext(vision_cfg) -> bool:
    from .convnext import is_convnext

    return is_convnext(vision_cfg)


def _is_eva(vision_cfg) -> bool:
    from .eva import is_eva

    return is_eva(vision_cfg)


def _is_fastvit(vision_cfg) -> bool:
    from .fastvit import is_fastvit

    return is_fastvit(vision_cfg)


def _is_vitamin(vision_cfg) -> bool:
    from .vitamin import is_vitamin

    return is_vitamin(vision_cfg)


def _is_swin(vision_cfg) -> bool:
    from .swin import is_swin

    return is_swin(vision_cfg)


def _is_relpos(vision_cfg) -> bool:
    from .relpos_vit import is_relpos_vit

    return is_relpos_vit(vision_cfg)


def encode_image(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: jax.Array,  # (B, H, W, 3) NHWC normalized
    *,
    normalize: bool = False,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
    stats_sink=None,
    bn_eval: bool = False,  # frozen-BN semantics: normalize with running stats even in train mode
) -> jax.Array:
    vcfg = cfg.vision_cfg
    if isinstance(image, dict) and not _is_naflex(vcfg):
        raise ValueError(
            "got a NaFlex patch-dict batch but the model's vision tower is not a "
            "naflexvit_* — use a naflex model (e.g. naflex_ViT-B-16) or image-tensor data")
    if _is_naflex(vcfg):
        from . import naflex_vit

        ncfg = naflex_vit.parse_naflex_cfg(vcfg)
        pooled, _ = naflex_vit.apply_naflex_vit(
            params["visual"], ncfg, image, compute_dtype=compute_dtype, remat=remat,
            act=_act_name(cfg),
        )
    elif vcfg.is_resnet:
        from . import resnet

        pooled = resnet.apply_modified_resnet(
            params["visual"], vcfg, image, compute_dtype=compute_dtype,
            use_batch_stats=train and not bn_eval, stats_sink=stats_sink,
        )
    elif _is_convnext(vcfg):
        from . import convnext

        pooled = convnext.apply_convnext(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    elif _is_eva(vcfg):
        from . import eva

        pooled = eva.apply_eva(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    elif _is_fastvit(vcfg):
        from . import fastvit

        pooled = fastvit.apply_fastvit(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    elif _is_vitamin(vcfg):
        from . import vitamin

        pooled = vitamin.apply_vitamin(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    elif _is_swin(vcfg):
        from . import swin

        pooled = swin.apply_swin(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    elif _is_relpos(vcfg):
        from . import relpos_vit

        pooled = relpos_vit.apply_relpos_vit(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat,
        )
    else:
        pooled, _ = vit.apply_vision_tower(
            params["visual"], vcfg, image, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat, attn_impl=attn_impl,
            act=_act_name(cfg),
        )
    if normalize:
        pooled = _l2_normalize(pooled)
    return pooled


def encode_text(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    text: jax.Array,  # (B, L) int ids
    *,
    normalize: bool = False,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
) -> jax.Array:
    tcfg = cfg.text_cfg
    if tcfg.hf_model_name or tcfg.hf_model_config:
        from . import hf_text

        pooled, _ = hf_text.apply_hf_text_tower(
            params["text"], tcfg, text, compute_dtype=compute_dtype, remat=remat,
            attn_impl=attn_impl,
        )
    elif tcfg.text_arch == "modern":
        from . import modern_text

        pooled, _ = modern_text.apply_modern_text_tower(
            params["text"], tcfg, text, compute_dtype=compute_dtype, remat=remat,
            attn_impl=attn_impl,
        )
    else:
        pooled, _ = text_mod.apply_text_tower(
            params["text"], tcfg, text, compute_dtype=compute_dtype, remat=remat,
            attn_impl=attn_impl, act=_act_name(cfg),
        )
    if normalize:
        pooled = _l2_normalize(pooled)
    return pooled


def _l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    # fp32 norm for stability under bf16 compute
    x32 = x.astype(jnp.float32)
    n = jnp.linalg.norm(x32, axis=axis, keepdims=True)
    return (x32 / jnp.maximum(n, eps)).astype(x.dtype)


def clip_forward(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: Optional[jax.Array] = None,
    text: Optional[jax.Array] = None,
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
    stats_sink=None,
    bn_eval: bool = False,
    return_hidden: bool = False,
) -> Dict[str, jax.Array]:
    """Dict-output forward matching reference CLIP.forward(output_dict=True)
    (model.py:528-548). CoCa configs (multimodal_cfg) also return decoder logits
    (or pre-projection hidden states under ``return_hidden`` for the fused-CE path)."""
    if cfg.multimodal_cfg is not None:
        from . import coca

        return coca.coca_forward(
            params, cfg, image, text, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat, return_hidden=return_hidden,
        )
    if cfg.audio_cfg is not None:
        from . import clap

        return clap.clap_forward(
            params, cfg, image, text, compute_dtype=compute_dtype, remat=remat,
        )
    out: Dict[str, jax.Array] = {}
    if image is not None:
        out["image_features"] = encode_image(
            params, cfg, image, normalize=True, train=train, rng=rng,
            compute_dtype=compute_dtype, remat=remat, attn_impl=attn_impl,
            stats_sink=stats_sink, bn_eval=bn_eval,
        )
    if text is not None:
        out["text_features"] = encode_text(
            params, cfg, text, normalize=True, compute_dtype=compute_dtype,
            remat=remat, attn_impl=attn_impl,
        )
    out["logit_scale"] = jnp.exp(params["logit_scale"].astype(jnp.float32))
    if "logit_bias" in params:
        out["logit_bias"] = params["logit_bias"].astype(jnp.float32)
    return out


def get_logits(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: jax.Array,
    text: jax.Array,
    **kw,
):
    """(logits_per_image, logits_per_text) — reference model.py:505-516."""
    out = clip_forward(params, cfg, image, text, **kw)
    scale = out["logit_scale"]
    logits = scale * out["image_features"].astype(jnp.float32) @ out["text_features"].astype(jnp.float32).T
    if "logit_bias" in out:
        logits = logits + out["logit_bias"]
    return logits, logits.T


def clamp_logit_scale(params: Dict[str, Any], max_val: float = LOGIT_SCALE_MAX) -> Dict[str, Any]:
    """Post-step clamp of the temperature (reference train.py:201-218 / base_task clamp)."""
    params = dict(params)
    params["logit_scale"] = jnp.minimum(params["logit_scale"], max_val)
    return params


class CLIPModel:
    """Object facade bundling (cfg, params) with jit-cached encode functions.

    Mirrors the reference's user-facing model API: ``encode_image(image, normalize=False)``,
    ``encode_text(text, normalize=False)``, ``get_logits``, callable forward returning a dict.
    """

    def __init__(self, cfg: CLIPModelCfg, params: Dict[str, Any], compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self._encode_image = jax.jit(
            functools.partial(encode_image, cfg=cfg, compute_dtype=compute_dtype),
            static_argnames=("normalize",),
        )
        self._encode_text = jax.jit(
            functools.partial(encode_text, cfg=cfg, compute_dtype=compute_dtype),
            static_argnames=("normalize",),
        )

    # -- reference-compatible API ------------------------------------------------
    def encode_image(self, image, normalize: bool = False):
        return self._encode_image(self.params, image=jnp.asarray(image), normalize=normalize)

    def encode_text(self, text, normalize: bool = False):
        return self._encode_text(self.params, text=jnp.asarray(text), normalize=normalize)

    def get_logits(self, image, text):
        return get_logits(self.params, self.cfg, jnp.asarray(image), jnp.asarray(text),
                          compute_dtype=self.compute_dtype)

    def forward_intermediates(self, image=None, text=None, **kw):
        return forward_intermediates(
            self.params, self.cfg,
            None if image is None else jnp.asarray(image),
            None if text is None else jnp.asarray(text),
            compute_dtype=self.compute_dtype, **kw,
        )

    def encode_audio(self, audio, normalize: bool = False):
        from . import clap

        audio = {k: jnp.asarray(v) for k, v in audio.items()}
        return clap.encode_audio(self.params, self.cfg, audio, normalize=normalize,
                                 compute_dtype=self.compute_dtype)

    def generate(self, image, **kw):
        """Caption images (CoCa configs; reference CoCa.generate, coca_model.py:248)."""
        if self.cfg.multimodal_cfg is None:
            raise ValueError("generate() requires a CoCa config (multimodal_cfg)")
        from . import coca

        # default matches the reference (coca_model.py:248 generation_type="beam_search");
        # top_k/top_p are forwarded to the sampling loop rather than silently dropped
        gt = kw.get("generation_type", "beam_search")
        # jax-native sampling entropy: seed=N is facade sugar for rng=PRNGKey(N)
        # (the torch reference samples from global RNG state instead)
        seed = kw.pop("seed", None)
        if seed is not None and "rng" not in kw:
            kw["rng"] = jax.random.PRNGKey(seed)
        if gt == "beam_search" or "num_beams" in kw:
            kw.pop("generation_type", None)
            kw.pop("rng", None)  # beam search is deterministic
            return coca.generate_beam(self.params, self.cfg, jnp.asarray(image),
                                      compute_dtype=self.compute_dtype, **kw)
        return coca.generate(self.params, self.cfg, jnp.asarray(image),
                             compute_dtype=self.compute_dtype, **kw)

    def __call__(self, image=None, text=None):
        return clip_forward(
            self.params, self.cfg,
            None if image is None else jnp.asarray(image),
            None if text is None else jnp.asarray(text),
            compute_dtype=self.compute_dtype,
        )

    @property
    def logit_scale(self):
        return self.params["logit_scale"]

    @property
    def visual_preprocess_cfg(self):
        return getattr(self, "_preprocess_cfg", None)


def forward_intermediates(
    params: Dict[str, Any],
    cfg: CLIPModelCfg,
    image: Optional[jax.Array] = None,
    text: Optional[jax.Array] = None,
    *,
    image_indices: Optional[list] = None,
    text_indices: Optional[list] = None,
    normalize: bool = True,
    normalize_intermediates: bool = False,
    compute_dtype=jnp.float32,
) -> Dict[str, Any]:
    """Feature-extraction API returning selected per-block intermediates alongside the
    pooled features (reference CLIP.forward_intermediates / VisionTransformer
    forward_intermediates, transformer.py:843-930). NLC layout; the vision prefix
    (class token) is split off like the reference."""
    from ..ops.layers import layer_norm
    from .blocks import apply_transformer_intermediates

    out: Dict[str, Any] = {}
    act = _act_name(cfg)
    if image is not None:
        vcfg = cfg.vision_cfg
        assert not vcfg.is_resnet and not _is_naflex(vcfg), "intermediates: native ViT only for now"
        vp = params["visual"]
        x = image.astype(compute_dtype)
        x = vit.patchify(x, vcfg.patch_size)
        x = jnp.dot(x, vp["patch_embed"]["kernel"].astype(compute_dtype))
        if vp["patch_embed"].get("bias") is not None:
            x = x + vp["patch_embed"]["bias"].astype(x.dtype)
        n_prefix = 0
        if "class_embedding" in vp:
            cls = jnp.broadcast_to(vp["class_embedding"].astype(x.dtype)[None, None], (x.shape[0], 1, x.shape[-1]))
            x = jnp.concatenate([cls, x], axis=1)
            n_prefix = 1
        x = x + vp["positional_embedding"][: x.shape[1]].astype(x.dtype)
        if "ln_pre" in vp:
            x = layer_norm(x, vp["ln_pre"]["scale"], vp["ln_pre"]["bias"], eps=vcfg.norm_eps)
        x, feats = apply_transformer_intermediates(
            vp["blocks"], x, heads=vcfg.heads, act=act, norm_eps=vcfg.norm_eps,
            take_indices=image_indices,
        )
        if normalize_intermediates:
            feats = [layer_norm(f, vp["ln_post"]["scale"], vp["ln_post"]["bias"], eps=vcfg.norm_eps) for f in feats]
        out["image_intermediates"] = [f[:, n_prefix:] for f in feats]
        if n_prefix:
            out["image_intermediates_prefix"] = [f[:, :n_prefix] for f in feats]
        pooled, _ = vit._pool(vp, vcfg, x, eps=vcfg.norm_eps)
        if vp.get("proj") is not None:
            pooled = jnp.dot(pooled, vp["proj"].astype(pooled.dtype))
        out["image_features"] = _l2_normalize(pooled) if normalize else pooled
    if text is not None:
        tcfg = cfg.text_cfg
        assert tcfg.text_arch != "modern" and not tcfg.hf_model_name, "intermediates: classic text tower"
        tp = params["text"]
        b, seq_len = text.shape
        x = tp["token_embedding"][text].astype(compute_dtype)
        bias, txt_causal = text_mod._build_bias(tcfg, text, seq_len)
        x = x + tp["positional_embedding"][:seq_len].astype(compute_dtype)
        x, feats = apply_transformer_intermediates(
            tp["blocks"], x, heads=tcfg.heads, act=act, bias=bias, causal=txt_causal,
            norm_eps=tcfg.ln_eps, take_indices=text_indices,
        )
        ln_f = lambda y: layer_norm(y, tp["ln_final"]["scale"], tp["ln_final"]["bias"], eps=tcfg.ln_eps)
        if normalize_intermediates:
            feats = [ln_f(f) for f in feats]
        out["text_intermediates"] = feats
        x = ln_f(x)
        pooled = text_mod.text_global_pool(x, text, pool_type=tcfg.pool_type, eos_token_id=tcfg.eos_id)
        tproj = tp.get("text_projection")
        if tproj is not None:
            if isinstance(tproj, dict):
                from ..ops.layers import linear

                pooled = linear(pooled, tproj["kernel"], tproj.get("bias"))
            else:
                pooled = jnp.dot(pooled, tproj.astype(pooled.dtype))
        out["text_features"] = _l2_normalize(pooled) if normalize else pooled
    out["logit_scale"] = jnp.exp(params["logit_scale"].astype(jnp.float32))
    return out
