"""HF text towers — native JAX via transformers' Flax models.

Equivalent of reference ``src/open_clip/hf_model.py`` (HFTextEncoder): any AutoModel as
text encoder + pooler registry (mean / cls / max / cls-last-hidden) + linear/MLP
projection. Where the reference wraps torch AutoModel, this wraps the *Flax* model
classes, so the tower runs inside the same jit/pjit programs as the rest of the model —
no torch in the compute path.

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


def _resolve_flax_model(cfg: CLIPTextCfg):
    import transformers

    if cfg.hf_model_config:
        model_type = cfg.hf_model_config.get("model_type", "roberta")
        conf_cls_name, model_cls_name = _ARCH_CLASSES.get(model_type, _ARCH_CLASSES["roberta"])
        conf_cls = getattr(transformers, conf_cls_name)
        kw = {k: v for k, v in cfg.hf_model_config.items() if k != "model_type"}
        config = conf_cls(**kw)
    else:
        config = transformers.AutoConfig.from_pretrained(cfg.hf_model_name)
        model_type = config.model_type
        _, model_cls_name = _ARCH_CLASSES.get(model_type, _ARCH_CLASSES["roberta"])
    model_cls = getattr(transformers, model_cls_name)
    return config, model_cls


def init_hf_text_tower(key, cfg: CLIPTextCfg, embed_dim: int) -> Dict[str, Any]:
    config, model_cls = _resolve_flax_model(cfg)
    flax_model = model_cls(config, seed=int(jax.random.randint(key, (), 0, 2 ** 31 - 1)))
    width = getattr(config, "hidden_size", getattr(config, "d_model", 768))
    ks = jax.random.split(key, 3)
    p: Dict[str, Any] = {"hf": flax_model.params}
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
    flax_model = _HFApply.get(cfg)
    attention_mask = (text != cfg.pad_id).astype(jnp.int32)
    kw = {}
    model_type = (cfg.hf_model_config or {}).get(
        "model_type", getattr(flax_model.config, "model_type", ""))
    if model_type in ("roberta", "xlm-roberta", "clap"):
        # roberta-style position ids (pad stays pad, others count from pad_id+1).
        # The flax *module* defaults to bert-style arange — the offset logic lives in
        # the PreTrainedModel wrapper that module.apply bypasses, so compute it here
        # (transformers create_position_ids_from_input_ids).
        inc = jnp.cumsum(attention_mask, axis=1) * attention_mask
        kw["position_ids"] = inc + cfg.pad_id
    out = flax_model.module.apply(
        {"params": params["hf"]}, input_ids=text, attention_mask=attention_mask, **kw,
    )
    hidden = out.last_hidden_state  # (B, L, W)

    pooler = cfg.hf_pooler_type
    mask = attention_mask.astype(jnp.float32)[..., None]
    if pooler == "mean_pooler":
        pooled = (hidden.astype(jnp.float32) * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
    elif pooler == "max_pooler":
        neg = jnp.finfo(jnp.float32).min
        pooled = jnp.where(mask > 0, hidden.astype(jnp.float32), neg).max(axis=1)
    elif pooler == "cls_pooler" and getattr(out, "pooler_output", None) is not None:
        # use the model's own pooling head (dense+tanh) like reference ClsPooler
        # with use_pooler_output=True (hf_model.py:64-81); HF-CLAP checkpoints
        # require this path
        pooled = out.pooler_output.astype(jnp.float32)
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
