"""HF text towers — native JAX implementations of the HF text-encoder archs.

Equivalent of reference ``src/open_clip/hf_model.py`` (HFTextEncoder): any AutoModel as
text encoder + pooler registry (mean / cls / max / cls-last-hidden) + linear/MLP
projection. Where the reference wraps torch AutoModel, the archs with pretrained
registry tags (bert/roberta/xlm-roberta, t5/mt5) run through our own forward passes
(``hf_native.py``) over the HF-Flax parameter layout — no torch and no transformers
model classes in the compute path. Other archs fall back to transformers' Flax
classes while those still exist upstream (deprecated for removal in v5).

Offline note: ``hf_model_name`` resolution needs hub/cache access for configs; the
``hf_model_config`` dict (same field as the reference) builds a local config without
any network, which is also how tests construct towers.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.layers import gelu as _gelu_dtype

from ..config import CLIPTextCfg
from . import blocks as B

_ARCH_CLASSES = {
    "roberta": ("RobertaConfig", "FlaxRobertaModel"),
    "xlm-roberta": ("XLMRobertaConfig", "FlaxXLMRobertaModel"),
    "bert": ("BertConfig", "FlaxBertModel"),
    "mt5": ("MT5Config", "FlaxMT5EncoderModel"),
    "t5": ("T5Config", "FlaxT5EncoderModel"),
}


def _resolve_hf_config(cfg: CLIPTextCfg):
    """-> (config object, model_type str). Config classes are NOT deprecated
    upstream — only the Flax model classes are; model_type picks our native
    forward (hf_native.py) with the Flax classes as fallback for exotic archs."""
    import transformers

    if cfg.hf_model_config:
        model_type = cfg.hf_model_config.get("model_type", "roberta")
        conf_cls_name, _ = _ARCH_CLASSES.get(model_type, _ARCH_CLASSES["roberta"])
        conf_cls = getattr(transformers, conf_cls_name)
        kw = {k: v for k, v in cfg.hf_model_config.items() if k != "model_type"}
        config = conf_cls(**kw)
    else:
        config = transformers.AutoConfig.from_pretrained(cfg.hf_model_name)
        model_type = config.model_type
    return config, model_type


def _resolve_flax_model(cfg: CLIPTextCfg):
    import transformers

    config, model_type = _resolve_hf_config(cfg)
    _, model_cls_name = _ARCH_CLASSES.get(model_type, _ARCH_CLASSES["roberta"])
    model_cls = getattr(transformers, model_cls_name)
    return config, model_cls


def init_hf_text_tower(key, cfg: CLIPTextCfg, embed_dim: int) -> Dict[str, Any]:
    from . import hf_native

    config, model_type = _resolve_hf_config(cfg)
    width = getattr(config, "hidden_size", getattr(config, "d_model", 768))
    ks = jax.random.split(key, 3)
    if model_type in hf_native.NATIVE_BERT_TYPES:
        hf_params = hf_native.init_bert_params(ks[2], config)
    elif model_type in hf_native.NATIVE_T5_TYPES:
        hf_params = hf_native.init_t5_params(ks[2], config)
    else:  # exotic arch: init through the Flax class while it exists
        _, model_cls = _resolve_flax_model(cfg)
        flax_model = model_cls(config, seed=int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
        hf_params = flax_model.params
    p: Dict[str, Any] = {"hf": hf_params}
    if cfg.hf_proj_type == "linear":
        p["proj"] = {"kernel": B.normal_init(ks[0], (width, embed_dim), width ** -0.5)}
    elif cfg.hf_proj_type == "mlp":
        hidden = (width + embed_dim) // 2
        p["proj"] = {
            "fc1": B.torch_linear_init(ks[0], width, hidden, bias=False),
            "fc2": B.torch_linear_init(ks[1], hidden, embed_dim, bias=False),
        }
    elif cfg.hf_proj_type == "clap_mlp":
        # HF Transformers CLAP text-projection layout: biased linears + ReLU
        # (reference hf_model.py:192-198)
        p["proj"] = {
            "fc1": B.torch_linear_init(ks[0], width, embed_dim, bias=True),
            "fc2": B.torch_linear_init(ks[1], embed_dim, embed_dim, bias=True),
        }
    return p


class _HFApply:
    """Cache of flax module objects per config (modules are stateless; params live in
    our tree)."""

    _cache: Dict[str, Any] = {}

    @classmethod
    def get(cls, cfg: CLIPTextCfg):
        key = repr(sorted((cfg.hf_model_config or {}).items())) + str(cfg.hf_model_name)
        if key not in cls._cache:
            config, model_cls = _resolve_flax_model(cfg)
            cls._cache[key] = model_cls(config, _do_init=False)
        return cls._cache[key]


def apply_hf_text_tower(
    params: Dict[str, Any],
    cfg: CLIPTextCfg,
    text: jax.Array,  # (B, L) int ids
    *,
    compute_dtype=jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
) -> Tuple[jax.Array, jax.Array]:
    """-> (pooled (B, embed_dim), tokens). Pooler per cfg.hf_pooler_type
    (reference hf_model.py:47-98)."""
    from . import hf_native

    attention_mask = (text != cfg.pad_id).astype(jnp.int32)
    try:
        config, model_type = _resolve_hf_config(cfg)
    except Exception:  # pragma: no cover — transformers missing entirely
        config, model_type = None, ""

    pooler_output = None
    if config is not None and model_type in hf_native.NATIVE_BERT_TYPES:
        position_ids = None
        if model_type in ("roberta", "xlm-roberta", "camembert", "clap"):
            # roberta-style position ids (pad stays pad, others count from
            # pad_id+1): transformers create_position_ids_from_input_ids
            inc = jnp.cumsum(attention_mask, axis=1) * attention_mask
            position_ids = inc + cfg.pad_id
        hidden, pooler_output = hf_native.bert_encode(
            params["hf"], config, text, attention_mask, position_ids=position_ids)
    elif config is not None and model_type in hf_native.NATIVE_T5_TYPES:
        hidden = hf_native.t5_encode(params["hf"], config, text, attention_mask)
    else:  # exotic arch: transformers Flax class fallback
        flax_model = _HFApply.get(cfg)
        out = flax_model.module.apply(
            {"params": params["hf"]}, input_ids=text, attention_mask=attention_mask,
        )
        hidden = out.last_hidden_state
        pooler_output = getattr(out, "pooler_output", None)

    pooler = cfg.hf_pooler_type
    mask = attention_mask.astype(jnp.float32)[..., None]
    if pooler == "mean_pooler":
        pooled = (hidden.astype(jnp.float32) * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
    elif pooler == "max_pooler":
        neg = jnp.finfo(jnp.float32).min
        pooled = jnp.where(mask > 0, hidden.astype(jnp.float32), neg).max(axis=1)
    elif pooler == "cls_pooler" and pooler_output is not None:
        # use the model's own pooling head (dense+tanh) like reference ClsPooler
        # with use_pooler_output=True (hf_model.py:64-81); HF-CLAP checkpoints
        # require this path
        pooled = pooler_output.astype(jnp.float32)
    elif pooler in ("cls_pooler", "cls_last_hidden_state_pooler"):
        pooled = hidden[:, 0].astype(jnp.float32)
    else:
        raise ValueError(f"unknown hf pooler {pooler!r}")
    pooled = pooled.astype(compute_dtype)

    proj = params.get("proj")
    if proj is not None:
        if "kernel" in proj:
            pooled = jnp.dot(pooled, proj["kernel"].astype(pooled.dtype))
        else:
            h = jnp.dot(pooled, proj["fc1"]["kernel"].astype(pooled.dtype))
            if proj["fc1"].get("bias") is not None:
                h = h + proj["fc1"]["bias"].astype(h.dtype)
            act_name = cfg.hf_proj_type
            h = jax.nn.relu(h) if act_name == "clap_mlp" else _gelu_dtype(h)
            pooled = jnp.dot(h, proj["fc2"]["kernel"].astype(pooled.dtype))
            if proj["fc2"].get("bias") is not None:
                pooled = pooled + proj["fc2"]["bias"].astype(pooled.dtype)
    return pooled, hidden
