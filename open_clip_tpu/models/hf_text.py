"""HF text towers — native JAX implementations of the HF text-encoder archs.

Equivalent of reference ``src/open_clip/hf_model.py`` (HFTextEncoder): any AutoModel as
text encoder + pooler registry (mean / cls / max / cls-last-hidden) + linear/MLP
projection. Where the reference wraps torch AutoModel, every arch with a pretrained
registry tag (bert/roberta/xlm-roberta, t5/mt5, m2m_100/NLLB, modernbert) runs
through our own forward passes (``hf_native.py``) — no torch and no transformers
model classes anywhere in the compute path; transformers is needed only for config
objects and tokenizers. Unknown archs raise with a pointer to hf_native.py (the
round-3 fallback to transformers' deprecated Flax classes is gone).

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

# every arch here has a NATIVE forward in hf_native.py; the config classes are
# NOT deprecated upstream (only the Flax model classes were, and nothing here
# touches those anymore)
_ARCH_CONFIGS = {
    "roberta": "RobertaConfig",
    "xlm-roberta": "XLMRobertaConfig",
    "camembert": "CamembertConfig",
    "bert": "BertConfig",
    "mt5": "MT5Config",
    "t5": "T5Config",
    "m2m_100": "M2M100Config",
    "modernbert": "ModernBertConfig",
}


def _resolve_hf_config(cfg: CLIPTextCfg):
    """-> (config object, model_type str). model_type picks the native forward
    in hf_native.py; unknown archs raise rather than silently running the wrong
    architecture (the reference serves any torch AutoModel, hf_model.py:106)."""
    import transformers

    if cfg.hf_model_config:
        model_type = cfg.hf_model_config.get("model_type", "roberta")
        if model_type not in _ARCH_CONFIGS:
            raise ValueError(
                f"unsupported hf_model_config model_type {model_type!r}: native "
                f"encoders cover {sorted(_ARCH_CONFIGS)}. Add a forward to "
                "models/hf_native.py to support a new architecture.")
        conf_cls = getattr(transformers, _ARCH_CONFIGS[model_type])
        kw = {k: v for k, v in cfg.hf_model_config.items() if k != "model_type"}
        config = conf_cls(**kw)
    else:
        config = transformers.AutoConfig.from_pretrained(cfg.hf_model_name)
        model_type = config.model_type
    return config, model_type


def init_hf_text_tower(key, cfg: CLIPTextCfg, embed_dim: int) -> Dict[str, Any]:
    from . import hf_native

    config, model_type = _resolve_hf_config(cfg)
    width = getattr(config, "hidden_size", getattr(config, "d_model", 768))
    ks = jax.random.split(key, 3)
    if model_type in hf_native.NATIVE_BERT_TYPES:
        hf_params = hf_native.init_bert_params(ks[2], config)
    elif model_type in hf_native.NATIVE_T5_TYPES:
        hf_params = hf_native.init_t5_params(ks[2], config)
    elif model_type in hf_native.NATIVE_M2M_TYPES:
        hf_params = hf_native.init_m2m100_params(ks[2], config)
    elif model_type in hf_native.NATIVE_MODERNBERT_TYPES:
        hf_params = hf_native.init_modernbert_params(ks[2], config)
    else:
        raise ValueError(f"no native encoder for hf model_type {model_type!r}")
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
    elif config is not None and model_type in hf_native.NATIVE_M2M_TYPES:
        hidden = hf_native.m2m100_encode(params["hf"], config, text, attention_mask)
    elif config is not None and model_type in hf_native.NATIVE_MODERNBERT_TYPES:
        hidden = hf_native.modernbert_encode(params["hf"], config, text, attention_mask)
    else:
        raise ValueError(f"no native encoder for hf model_type {model_type!r}")

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


def torch_hf_text_to_params(sd: Dict[str, Any], cfg: CLIPTextCfg) -> Dict[str, Any]:
    """Reference HFTextEncoder state dict (keys under ``transformer.`` /
    ``proj.``, the ``text.`` prefix already stripped) -> our param tree
    ``{"hf": <native layout>, "proj": ...}``.

    The reference stores encoder-decoder towers as their bare encoder
    (hf_model.py:153-176), so NLLB keys arrive as ``transformer.layers.<i>...``
    and mT5 as ``transformer.block.<i>...`` with no ``encoder.`` level.
    """
    from . import hf_native

    _, model_type = _resolve_hf_config(cfg)
    if model_type in hf_native.NATIVE_BERT_TYPES:
        hf = hf_native.torch_bert_to_layout(sd, prefix="transformer.")
    elif model_type in hf_native.NATIVE_T5_TYPES:
        lay = hf_native.torch_t5_to_layout(sd, prefix="transformer.")
        shared = lay.pop("shared")
        hf = {"shared": shared, "encoder": lay}
    elif model_type in hf_native.NATIVE_M2M_TYPES:
        hf = hf_native.torch_m2m100_to_layout(sd, prefix="transformer.")
    elif model_type in hf_native.NATIVE_MODERNBERT_TYPES:
        hf = hf_native.torch_modernbert_to_layout(sd, prefix="transformer.")
    else:
        raise ValueError(f"no native converter for hf model_type {model_type!r}")

    def _np(v):
        import numpy as np

        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    p: Dict[str, Any] = {"hf": hf}
    if "proj.weight" in sd:  # linear proj, bias=False (hf_model.py:186)
        p["proj"] = {"kernel": jnp.asarray(_np(sd["proj.weight"]).T)}
    elif "proj.0.weight" in sd:  # mlp / clap_mlp Sequential
        fc1 = {"kernel": jnp.asarray(_np(sd["proj.0.weight"]).T)}
        fc2 = {"kernel": jnp.asarray(_np(sd["proj.2.weight"]).T)}
        if "proj.0.bias" in sd:
            fc1["bias"] = jnp.asarray(_np(sd["proj.0.bias"]))
        if "proj.2.bias" in sd:
            fc2["bias"] = jnp.asarray(_np(sd["proj.2.bias"]))
        p["proj"] = {"fc1": fc1, "fc2": fc2}
    return p
