"""Torch-checkpoint <-> JAX-param conversion.

Behavioral equivalent of the reference's checkpoint loading stack
(``src/open_clip/factory.py:172-238`` load_state_dict/load_checkpoint,
``src/open_clip/model.py:670-737`` convert_to_custom_text_state_dict), re-targeted at
the functional param pytree used here (see models/clip.py):

- torch Linear weights (out, in) are transposed to (in, out) kernels;
- fused attention ``in_proj_weight`` (3W, W) becomes the (W, 3W) qkv kernel;
- the patch conv (W, 3, P, P) flattens to the (P*P*3, W) patchify matmul kernel;
- per-layer block weights are stacked along a leading layer axis for ``lax.scan``.

Tensors are converted through numpy; torch is only needed when reading ``.pt`` files.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from .config import CLIPModelCfg

logger = logging.getLogger(__name__)


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor (cpu) — avoid importing torch unless needed. Copy: .numpy()
    # on a CPU tensor SHARES storage, so without it a later in-place torch op
    # (e.g. optimizer.step() on the source model) silently mutates the
    # converted params.
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype is not None and str(t.dtype) == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy().copy()
    return np.asarray(t)


def normalize_torch_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Strip wrapper prefixes and re-home the flat OpenAI-CLIP text keys under ``text.``
    (reference convert_to_custom_text_state_dict, model.py:718-737)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("_orig_mod."):
            k = k[len("_orig_mod."):]
        if k.endswith("position_ids"):
            continue
        out[k] = _np(v)

    flat_text = any(
        k.startswith(("token_embedding", "ln_final", "transformer.resblocks")) or k == "text_projection"
        or k == "positional_embedding"
        for k in out
    ) and not any(k.startswith("text.") for k in out)
    if flat_text:
        remapped = {}
        for k, v in out.items():
            if k.startswith(("token_embedding", "ln_final", "transformer.", "cls_emb")) or k in (
                "positional_embedding",
                "text_projection",
            ) or k.startswith("text_projection."):
                remapped["text." + k] = v
            else:
                remapped[k] = v
        out = remapped
    return out


# ---------------------------------------------------------------------------
# torch -> jax
# ---------------------------------------------------------------------------

_BLOCK_RE = re.compile(r"^(.*?)transformer\.resblocks\.(\d+)\.(.*)$")


def _set(tree: dict, path, value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_block_key(rest: str, value: np.ndarray):
    """Map one reference resblock key suffix to (path, converted_value)."""
    m: Dict[str, Any] = {
        "ln_1.weight": (("ln_1", "scale"), value),
        "ln_1.bias": (("ln_1", "bias"), value),
        "ln_2.weight": (("ln_2", "scale"), value),
        "ln_2.bias": (("ln_2", "bias"), value),
        "attn.in_proj_weight": (("attn", "qkv", "kernel"), value.T),
        "attn.in_proj_bias": (("attn", "qkv", "bias"), value),
        "attn.out_proj.weight": (("attn", "out", "kernel"), value.T),
        "attn.out_proj.bias": (("attn", "out", "bias"), value),
        "attn.ln_q.weight": (("attn", "ln_q", "scale"), value),
        "attn.ln_q.bias": (("attn", "ln_q", "bias"), value),
        "attn.ln_k.weight": (("attn", "ln_k", "scale"), value),
        "attn.ln_k.bias": (("attn", "ln_k", "bias"), value),
        "attn.ln_inner.weight": (("attn", "ln_inner", "scale"), value),
        "attn.ln_inner.bias": (("attn", "ln_inner", "bias"), value),
        "attn.head_scale": (("attn", "head_scale"), value.reshape(-1)),
        "attn.logit_scale": (("attn", "logit_scale"), value.reshape(-1)),
        "ln_attn.weight": (("ln_attn", "scale"), value),
        "ln_attn.bias": (("ln_attn", "bias"), value),
        "mlp.c_fc.weight": (("mlp", "c_fc", "kernel"), value.T),
        "mlp.c_fc.bias": (("mlp", "c_fc", "bias"), value),
        "mlp.ln.weight": (("mlp", "ln", "scale"), value),
        "mlp.ln.bias": (("mlp", "ln", "bias"), value),
        "mlp.c_proj.weight": (("mlp", "c_proj", "kernel"), value.T),
        "mlp.c_proj.bias": (("mlp", "c_proj", "bias"), value),
        "ls_1.gamma": (("ls_1",), value),
        "ls_2.gamma": (("ls_2",), value),
        # cross-attention (CoCa multimodal decoder)
        "ln_1_kv.weight": (("ln_1_kv", "scale"), value),
        "ln_1_kv.bias": (("ln_1_kv", "bias"), value),
    }
    if rest in m:
        return m[rest]
    raise KeyError(rest)


def _stack_blocks(per_layer: Dict[int, dict]) -> dict:
    """{layer_idx: tree} -> single tree with stacked (L, ...) leaves."""
    n = max(per_layer) + 1
    assert set(per_layer) == set(range(n)), f"missing layers: {sorted(per_layer)}"

    def merge(paths, node0):
        if isinstance(node0, dict):
            return {k: merge(paths + [k], node0[k]) for k in node0}
        stacked = np.stack([_get(per_layer[i], paths) for i in range(n)])
        return stacked

    def _get(tree, paths):
        for p in paths:
            tree = tree[p]
        return tree

    return merge([], per_layer[0])


def _convert_attn_pool(prefix: str, sd: Dict[str, np.ndarray], tree: dict, pool_key: str) -> None:
    """AttentionalPooler weights: nn.MultiheadAttention with kdim != dim uses separate
    q/k/v projection weights (reference transformer.py:251-273)."""
    sub = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if not sub:
        return
    p: Dict[str, Any] = {"query": sub["query"], "attn": {}}
    a = p["attn"]
    if "attn.in_proj_weight" in sub:
        w = sub["attn.in_proj_weight"]
        d = w.shape[0] // 3
        a["q"] = {"kernel": w[:d].T}
        a["k"] = {"kernel": w[d : 2 * d].T}
        a["v"] = {"kernel": w[2 * d :].T}
    else:
        a["q"] = {"kernel": sub["attn.q_proj_weight"].T}
        a["k"] = {"kernel": sub["attn.k_proj_weight"].T}
        a["v"] = {"kernel": sub["attn.v_proj_weight"].T}
    if "attn.in_proj_bias" in sub:
        bqkv = sub["attn.in_proj_bias"]
        d = bqkv.shape[0] // 3
        a["q"]["bias"], a["k"]["bias"], a["v"]["bias"] = bqkv[:d], bqkv[d : 2 * d], bqkv[2 * d :]
    a["out"] = {"kernel": sub["attn.out_proj.weight"].T, "bias": sub["attn.out_proj.bias"]}
    p["ln_q"] = {"scale": sub["ln_q.weight"], "bias": sub["ln_q.bias"]}
    p["ln_k"] = {"scale": sub["ln_k.weight"], "bias": sub["ln_k.bias"]}
    tree[pool_key] = p


def _convert_timm_vit_trunk(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a timm-ViT trunk (``visual.trunk.*`` keys of a reference SigLIP-family
    torch checkpoint, built via timm in reference timm_model.py:63-110) into the native
    vision tower layout (same target tree as load_big_vision_weights)."""

    def t(k):
        v = sd[k]
        # copy: .numpy() shares CPU-tensor storage (see _np above)
        return np.asarray(v.detach().cpu().numpy().copy() if hasattr(v, "detach") else v)

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def lin(prefix):
        p = {"kernel": t(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            p["bias"] = t(f"{prefix}.bias")
        return p

    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("visual.trunk.blocks.")
    )
    blocks = {}
    for i in range(n_layers):
        b = f"visual.trunk.blocks.{i}"
        blocks[i] = {
            "ln_1": ln(f"{b}.norm1"),
            "attn": {"qkv": lin(f"{b}.attn.qkv"), "out": lin(f"{b}.attn.proj")},
            "ln_2": ln(f"{b}.norm2"),
            "mlp": {"c_fc": lin(f"{b}.mlp.fc1"), "c_proj": lin(f"{b}.mlp.fc2")},
        }

    emb = t("visual.trunk.patch_embed.proj.weight")  # (W, 3, P, P) or 1x1 (W, C, 1, 1)
    pos = t("visual.trunk.pos_embed")
    vis: Dict[str, Any] = {
        "patch_embed": {
            "kernel": emb.transpose(2, 3, 1, 0).reshape(-1, emb.shape[0]),
            "bias": t("visual.trunk.patch_embed.proj.bias"),
        },
        "positional_embedding": pos.reshape(-1, pos.shape[-1]),
        "ln_post": ln("visual.trunk.norm") if "visual.trunk.norm.weight" in sd
        else ln("visual.trunk.fc_norm"),  # gap trunks norm after pooling (fc_norm)
        "blocks": _stack_blocks(blocks),
    }
    if "visual.trunk.cls_token" in sd:
        vis["class_embedding"] = t("visual.trunk.cls_token").reshape(-1)
    if "visual.trunk.norm_pre.weight" in sd:  # timm pre_norm (clip-style trunks)
        vis["ln_pre"] = ln("visual.trunk.norm_pre")
    if "visual.trunk.patch_embed.backbone.0.conv.weight" in sd:
        # MCi hybrid conv stem (timm vit_base_mci_224, MobileCLIP-B trunk)
        stem = []
        i = 0
        while f"visual.trunk.patch_embed.backbone.{i}.conv.weight" in sd:
            b = f"visual.trunk.patch_embed.backbone.{i}"
            stem.append({
                "conv": {"kernel": t(f"{b}.conv.weight").transpose(2, 3, 1, 0)},
                "bn": {"scale": t(f"{b}.bn.weight"), "bias": t(f"{b}.bn.bias"),
                       "mean": t(f"{b}.bn.running_mean"), "var": t(f"{b}.bn.running_var")},
            })
            i += 1
        vis["conv_stem"] = stem
    if "visual.trunk.head.weight" in sd:
        # trunk-head projection (reference TimmModel with timm_proj=None: the timm
        # trunk's classifier head maps width -> embed_dim)
        vis["proj"] = t("visual.trunk.head.weight").T
        if "visual.trunk.head.bias" in sd:
            vis["proj_bias"] = t("visual.trunk.head.bias")
    if "visual.trunk.attn_pool.latent" in sd:
        ap = "visual.trunk.attn_pool"
        vis["map_pool"] = {
            "latent": t(f"{ap}.latent").reshape(-1),
            "q": lin(f"{ap}.q"),
            "kv": lin(f"{ap}.kv"),
            "proj": lin(f"{ap}.proj"),
            "norm": ln(f"{ap}.norm"),
            "mlp": {"c_fc": lin(f"{ap}.mlp.fc1"), "c_proj": lin(f"{ap}.mlp.fc2")},
        }
    return vis


def _convert_timm_naflexvit_trunk(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Convert a timm-NaFlexVit trunk (``visual.trunk.*`` keys of a reference
    SigLIP2-naflex / naflex-family torch checkpoint, built via timm NaFlexVit in
    reference timm_model.py) into the native NaFlex tower layout
    (models/naflex_vit.init_naflex_vit tree).

    timm's NaFlex patchifier flattens patches channels-last ``(py, px, c)`` — the
    same order data/naflex.NaFlexTransform produces — so the linear patch-embed
    kernel transposes directly with no column permutation."""

    def t(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy().copy() if hasattr(v, "detach") else v)

    def ln(prefix):
        return {"scale": t(f"{prefix}.weight"), "bias": t(f"{prefix}.bias")}

    def lin(prefix):
        p = {"kernel": t(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            p["bias"] = t(f"{prefix}.bias")
        return p

    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd if k.startswith("visual.trunk.blocks.")
    )
    blocks = {}
    for i in range(n_layers):
        b = f"visual.trunk.blocks.{i}"
        blk = {
            "ln_1": ln(f"{b}.norm1"),
            "attn": {"qkv": lin(f"{b}.attn.qkv"), "out": lin(f"{b}.attn.proj")},
            "ln_2": ln(f"{b}.norm2"),
        }
        if f"{b}.mlp.fc1_g.weight" in sd:  # timm SwiGLU: fc1_g (gate) + fc1_x
            g, x_ = t(f"{b}.mlp.fc1_g.weight"), t(f"{b}.mlp.fc1_x.weight")
            w12 = {"kernel": np.concatenate([x_.T, g.T], axis=1)}
            if f"{b}.mlp.fc1_g.bias" in sd:
                w12["bias"] = np.concatenate([t(f"{b}.mlp.fc1_x.bias"), t(f"{b}.mlp.fc1_g.bias")])
            blk["mlp"] = {"w12": w12, "w3": lin(f"{b}.mlp.fc2")}
        else:
            blk["mlp"] = {"c_fc": lin(f"{b}.mlp.fc1"), "c_proj": lin(f"{b}.mlp.fc2")}
        if f"{b}.ls1.gamma" in sd:
            blk["ls_1"] = t(f"{b}.ls1.gamma")
            blk["ls_2"] = t(f"{b}.ls2.gamma")
        blocks[i] = blk

    pos = t("visual.trunk.pos_embed")  # (1, gh, gw, W)
    vis: Dict[str, Any] = {
        "patch_embed": lin("visual.trunk.patch_embed.proj"),
        "pos_embed": pos.reshape(pos.shape[-3], pos.shape[-2], pos.shape[-1]),
        "norm": ln("visual.trunk.norm") if "visual.trunk.norm.weight" in sd
        else ln("visual.trunk.fc_norm"),
        "blocks": _stack_blocks(blocks),
    }
    if "visual.trunk.norm_pre.weight" in sd:
        vis["norm_pre"] = ln("visual.trunk.norm_pre")
    if "visual.trunk.cls_token" in sd:
        vis["cls_token"] = t("visual.trunk.cls_token").reshape(-1)
    if "visual.trunk.reg_token" in sd:
        vis["reg_tokens"] = t("visual.trunk.reg_token").reshape(
            -1, t("visual.trunk.reg_token").shape[-1])
    if "visual.trunk.attn_pool.latent" in sd:
        ap = "visual.trunk.attn_pool"
        vis["attn_pool"] = {
            "latent": t(f"{ap}.latent").reshape(-1),
            "q": lin(f"{ap}.q"),
            "kv": lin(f"{ap}.kv"),
            "proj": lin(f"{ap}.proj"),
            "norm": ln(f"{ap}.norm"),
            "mlp": {"c_fc": lin(f"{ap}.mlp.fc1"), "c_proj": lin(f"{ap}.mlp.fc2")},
        }
    # projection head: open_clip TimmModel head (visual.head.proj), trunk classifier
    # head, or none (timm_proj='none': identity — embed_dim == trunk width)
    if "visual.head.proj.weight" in sd:
        vis["head"] = {"kernel": t("visual.head.proj.weight").T}
        if "visual.head.proj.bias" in sd:
            vis["head"]["bias"] = t("visual.head.proj.bias")
    elif "visual.trunk.head.weight" in sd:
        vis["head"] = {"kernel": t("visual.trunk.head.weight").T}
        if "visual.trunk.head.bias" in sd:
            vis["head"]["bias"] = t("visual.trunk.head.bias")
    else:
        width = vis["norm"]["scale"].shape[0]
        vis["head"] = {"kernel": np.eye(width, dtype=np.float32)}
    return vis


def convert_params_dtype(params, dtype):
    """Cast linear/conv kernels+biases and bare projection leaves to ``dtype``,
    keeping norm affine params (scale/bias pairs), embeddings, and logit scales in
    fp32 — the same partition reference ``convert_weights_to_lp`` applies
    (model.py:738-771) so fp32 islands stay fp32 under pure_bf16/pure_fp16.
    """
    PROJ_LEAVES = {"proj", "text_projection", "head"}

    def rec(node):
        if not isinstance(node, dict):
            return node
        out = {}
        has_kernel = "kernel" in node
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = rec(v)
            elif hasattr(v, "astype") and getattr(v, "ndim", 0) >= 1 and (
                (has_kernel and k in ("kernel", "bias")) or (k in PROJ_LEAVES and v.ndim == 2)
            ):
                out[k] = v.astype(dtype)
            else:
                out[k] = v
        return out

    return rec(params)


def convert_weights_to_lp(model, dtype=None):
    """Reference-compatible in-place low-precision cast of a :class:`CLIPModel`
    facade (reference ``model.py:738-771`` mutates the torch module): replaces
    the params pytree via :func:`convert_params_dtype` and pins the facade's
    compute dtype. Functional callers should use ``convert_params_dtype``."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    model.params = convert_params_dtype(model.params, dtype)
    if hasattr(model, "compute_dtype"):
        model.compute_dtype = dtype
    return model


def convert_weights_to_fp16(model):
    import jax.numpy as jnp

    return convert_weights_to_lp(model, jnp.float16)



def convert_mobile_clip_state_dict(sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Apple MobileCLIP release checkpoint -> reference-style state dict.

    Mirrors reference ``convert_mobile_clip_state_dict`` (``convert.py:223-261``):
    the text side follows the reference's key map verbatim; the image side maps
    Apple's ml-mobileclip fastvit module names onto timm's ``fastvit.py`` layout
    (the reference delegates this to ``timm.models.fastvit.checkpoint_filter_fn``),
    which ``models/fastvit.py`` then collapses into the native tree."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        v = _np(v)
        if k == "logit_scale":
            out["logit_scale"] = v
            continue
        if k.startswith("text_encoder."):
            k = k[len("text_encoder."):]
            k = k.replace("projection_layer", "text_projection")
            k = k.replace("embedding_layer", "token_embedding")
            if k.startswith("positional_embedding.pos_embed.pos_embed"):
                k = "positional_embedding"
                v = v.squeeze()
            k = k.replace("final_layer_norm", "ln_final")
            k = k.replace("pre_norm_mha.0", "ln_1")
            k = k.replace("pre_norm_mha.1", "attn")
            k = k.replace("pre_norm_ffn.0", "ln_2")
            k = k.replace("pre_norm_ffn.1", "mlp.c_fc")
            k = k.replace("pre_norm_ffn.4", "mlp.c_proj")
            k = k.replace("qkv_proj.weight", "in_proj_weight")
            k = k.replace("qkv_proj.bias", "in_proj_bias")
            k = k.replace("transformer.", "transformer.resblocks.")
            out["text." + k] = v
            continue
        if k.startswith("image_encoder.model."):
            k = k[len("image_encoder.model."):]
            # Apple fastvit module names -> timm fastvit names
            k = k.replace("patch_embed.", "stem.")
            k = k.replace("rbr_conv", "conv_kxk")
            k = k.replace("rbr_scale", "conv_scale")
            k = k.replace("rbr_skip", "identity")
            k = k.replace("lkb_origin", "large_conv")
            k = k.replace("lkb_reparam", "reparam_conv")
            k = k.replace("convffn", "mlp")
            k = k.replace("conv_exp.", "final_conv.")
            k = k.replace("se.reduce", "se.fc1")
            k = k.replace("se.expand", "se.fc2")
            if k.startswith("head."):
                k = "head.fc." + k[len("head."):]
            # network list: [stage0, down1, stage1, down2, stage2, down3, cpe, stage3]
            net_map = {
                "network.0.": "stages.0.blocks.",
                "network.1.": "stages.1.downsample.",
                "network.2.": "stages.1.blocks.",
                "network.3.": "stages.2.downsample.",
                "network.4.": "stages.2.blocks.",
                "network.5.": "stages.3.downsample.",
                "network.6.": "stages.3.pos_emb.",
                "network.7.": "stages.3.blocks.",
            }
            for src, dst in net_map.items():
                if k.startswith(src):
                    k = dst + k[len(src):]
                    break
            if ".pos_emb." in k:
                k = k.replace(".pe.", ".pos_enc.")
            if k.endswith("layer_scale") or ".layer_scale." in k or \
                    k.endswith(("layer_scale_1", "layer_scale_2")):
                k = k.replace("layer_scale_1", "layer_scale_1.gamma") \
                    if k.endswith("layer_scale_1") else k
                k = k.replace("layer_scale_2", "layer_scale_2.gamma") \
                    if k.endswith("layer_scale_2") else k
                if k.endswith("layer_scale"):
                    k = k + ".gamma"
            out["visual.trunk." + k] = v
            continue
        out[k] = v
    return out


def torch_clip_to_params(sd: Mapping[str, Any], cfg: Optional[CLIPModelCfg] = None) -> Dict[str, Any]:
    """Convert a reference CLIP/CustomTextCLIP state dict into the JAX param tree."""
    sd = normalize_torch_state_dict(sd)
    if any(k.startswith("image_encoder.") for k in sd):
        # Apple MobileCLIP release format (reference convert.py:223-261)
        sd = convert_mobile_clip_state_dict(sd)
    if cfg is not None and cfg.vision_cfg is not None:
        from .models.fastvit import is_fastvit, torch_fastvit_clip_to_params
        from .models.vitamin import is_vitamin, torch_vitamin_clip_to_params

        # fastvit/vitamin trunks share the "visual.trunk." prefixes with convnext
        # and timm ViTs — dispatch on the model cfg before the key heuristics below
        if is_fastvit(cfg.vision_cfg) and any(k.startswith("visual.trunk.") for k in sd):
            trunk_sd = {k[len("visual.trunk."):]: v for k, v in sd.items()
                        if k.startswith("visual.trunk.")}
            tree = torch_fastvit_clip_to_params(trunk_sd, cfg.vision_cfg, cfg.embed_dim)
            rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
            rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
            rest["visual"] = tree
            return rest
        if is_vitamin(cfg.vision_cfg) and any(k.startswith("visual.trunk.") for k in sd):
            vis_sd = {k[len("visual."):]: v for k, v in sd.items()
                      if k.startswith("visual.")}
            tree = torch_vitamin_clip_to_params(vis_sd, cfg.vision_cfg, cfg.embed_dim)
            rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
            rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
            rest["visual"] = tree
            return rest
    if any(k.startswith("visual.trunk.stem.") for k in sd):
        from .models import convnext

        assert cfg is not None, "convnext conversion needs the model cfg"
        tree = convnext.torch_convnext_clip_to_params(sd, cfg.vision_cfg)
        rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
        rest["visual"] = tree
        return rest
    if (cfg is not None and cfg.vision_cfg is not None
            and (cfg.vision_cfg.timm_model_name or "").startswith("naflexvit")
            and any(k.startswith("visual.trunk.") for k in sd)):
        # timm NaFlexVit trunks (SigLIP2-naflex and friends) convert into the native
        # NaFlex tower layout, not the fixed-grid ViT one
        tree = _convert_timm_naflexvit_trunk(sd)
        rest_sd = {k: v for k, v in sd.items()
                   if not k.startswith(("visual.trunk.", "visual.head."))}
        rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
        rest["visual"] = tree
        return rest
    if any(k.startswith("visual.trunk.layers.") and ".attn.relative_position_bias_table" in k
           for k in sd):
        # timm Swin trunk (reference timm_model.py:25 with swin_* configs)
        from .models.swin import torch_swin_to_params

        assert cfg is not None, "swin conversion needs the model cfg"
        trunk_sd = {k[len("visual.trunk."):]: v for k, v in sd.items()
                    if k.startswith("visual.trunk.")}
        for hk in ("head.proj.weight", "head.proj.bias"):
            if "visual." + hk in sd:  # TimmModel adapter projection
                trunk_sd[hk] = sd["visual." + hk]
        tree = torch_swin_to_params(trunk_sd, cfg.vision_cfg)
        rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
        rest["visual"] = tree
        return rest
    if any(k.startswith("visual.trunk.blocks.") and ".attn.rel_pos.mlp." in k for k in sd):
        # timm relpos-ViT trunk — must dispatch before the generic timm-ViT branch
        from .models.relpos_vit import torch_relpos_to_params

        assert cfg is not None, "relpos-ViT conversion needs the model cfg"
        trunk_sd = {k[len("visual.trunk."):]: v for k, v in sd.items()
                    if k.startswith("visual.trunk.")}
        for hk in ("head.proj.weight", "head.proj.bias"):
            if "visual." + hk in sd:
                trunk_sd[hk] = sd["visual." + hk]
        tree = torch_relpos_to_params(trunk_sd, cfg.vision_cfg)
        rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
        rest["visual"] = tree
        return rest
    if any(k.startswith("visual.trunk.blocks.") for k in sd):
        if cfg is not None and cfg.vision_cfg is not None:
            from .models.eva import is_eva, timm_eva_to_params

            if is_eva(cfg.vision_cfg):
                trunk_sd = {k[len("visual.trunk."):]: v for k, v in sd.items()
                            if k.startswith("visual.trunk.")}
                tree = timm_eva_to_params(trunk_sd, cfg.vision_cfg)
                rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
                rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
                rest["visual"] = tree
                return rest
        tree = _convert_timm_vit_trunk(sd)
        rest_sd = {k: v for k, v in sd.items() if not k.startswith("visual.")}
        rest = torch_clip_to_params(rest_sd, cfg) if rest_sd else {}
        rest["visual"] = tree
        return rest
    if any(k.startswith("visual.trunk.") for k in sd):
        raise NotImplementedError("timm-trunk checkpoints not yet supported by the converter")
    if any(k.startswith(("visual.layer1", "visual.layer2")) for k in sd):
        from .models import resnet

        return resnet.torch_resnet_clip_to_params(sd, cfg)
    if any(k.startswith("text_decoder.") for k in sd):
        from .models import coca

        rest_sd = {k: v for k, v in sd.items() if not k.startswith("text_decoder.")}
        tree = torch_clip_to_params(rest_sd, cfg)
        tree["text_decoder"] = coca.convert_multimodal_decoder(
            {k[len("text_decoder."):]: v for k, v in sd.items() if k.startswith("text_decoder.")}
        )
        return tree
    if (cfg is not None and cfg.text_cfg is not None
            and (cfg.text_cfg.hf_model_name or cfg.text_cfg.hf_model_config)
            and any(k.startswith("text.transformer.") for k in sd)):
        # CustomTextCLIP with an HF text tower (reference hf_model.py HFTextEncoder:
        # keys under text.transformer.* / text.proj.*); vision converts as usual.
        # Gated on the cfg's hf fields: the reference CLASSIC tower also nests
        # under text.transformer. (resblocks), and must take the block path below.
        from .models.hf_text import torch_hf_text_to_params

        vis_sd = {k: v for k, v in sd.items() if not k.startswith("text.")}
        tree = torch_clip_to_params(vis_sd, cfg) if vis_sd else {}
        tree["text"] = torch_hf_text_to_params(
            {k[len("text."):]: v for k, v in sd.items() if k.startswith("text.")},
            cfg.text_cfg)
        return tree

    if any(k.startswith("text.blocks.") for k in sd):
        # ModernTextTransformer text side; visual side handled by the standard path
        vis_sd = {k: v for k, v in sd.items() if not k.startswith("text.")}
        tree = torch_clip_to_params(vis_sd, cfg)
        tree["text"] = _convert_modern_text({k[len("text."):]: v for k, v in sd.items() if k.startswith("text.")})
        return tree

    tree: Dict[str, Any] = {}
    vis_blocks: Dict[int, dict] = {}
    txt_blocks: Dict[int, dict] = {}
    leftovers = []

    direct = {
        "visual.class_embedding": ("visual", "class_embedding"),
        "visual.positional_embedding": ("visual", "positional_embedding"),
        "visual.ln_pre.weight": ("visual", "ln_pre", "scale"),
        "visual.ln_pre.bias": ("visual", "ln_pre", "bias"),
        "visual.ln_post.weight": ("visual", "ln_post", "scale"),
        "visual.ln_post.bias": ("visual", "ln_post", "bias"),
        "visual.proj": ("visual", "proj"),
        "text.token_embedding.weight": ("text", "token_embedding"),
        "text.positional_embedding": ("text", "positional_embedding"),
        "text.cls_emb": ("text", "cls_emb"),
        "text.ln_final.weight": ("text", "ln_final", "scale"),
        "text.ln_final.bias": ("text", "ln_final", "bias"),
        "text.text_projection": ("text", "text_projection"),
        "logit_scale": ("logit_scale",),
        "logit_bias": ("logit_bias",),
    }

    for k, v in sd.items():
        if k.startswith(("visual.attn_pool.", "visual.attn_pool_contrastive.")):
            continue  # handled below as grouped sub-trees
        m = _BLOCK_RE.match(k)
        if m:
            prefix, idx, rest = m.group(1), int(m.group(2)), m.group(3)
            try:
                path, val = _convert_block_key(rest, v)
            except KeyError:
                leftovers.append(k)
                continue
            target = vis_blocks if prefix.startswith("visual.") else txt_blocks
            _set(target.setdefault(idx, {}), path, val)
            continue
        if k == "visual.conv1.weight":
            # (W, 3, P, P) -> (P, P, 3, W) -> (P*P*3, W)
            w = v.transpose(2, 3, 1, 0)
            _set(tree, ("visual", "patch_embed", "kernel"), w.reshape(-1, w.shape[-1]))
            continue
        if k == "text.text_projection.weight":
            _set(tree, ("text", "text_projection", "kernel"), v.T)
            continue
        if k == "text.text_projection.bias":
            _set(tree, ("text", "text_projection", "bias"), v)
            continue
        if k in direct:
            val = v.reshape(()) if direct[k][-1] in ("logit_scale", "logit_bias") and v.ndim == 1 else v
            _set(tree, direct[k], val)
            continue
        leftovers.append(k)

    if vis_blocks:
        tree.setdefault("visual", {})["blocks"] = _stack_blocks(vis_blocks)
    if txt_blocks:
        tree.setdefault("text", {})["blocks"] = _stack_blocks(txt_blocks)

    _convert_attn_pool("visual.attn_pool.", sd, tree.setdefault("visual", {}), "attn_pool")
    _convert_attn_pool("visual.attn_pool_contrastive.", sd, tree["visual"], "attn_pool_contrastive")

    if leftovers:
        logger.warning("unconverted checkpoint keys: %s", leftovers[:20])
        tree["_unconverted"] = leftovers

    return _to_jnp(tree)


def _to_jnp(tree):
    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, np.ndarray):
        return jnp.asarray(tree)
    return tree


def _convert_modern_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """ModernTextTransformer state dict (keys pre-stripped of 'text.') -> stacked tree.

    Reference layout (transformer.py:1200-1577): blocks.{i}.{norm1,attn.qkv,attn.q_norm,
    attn.k_norm,attn.gate,attn.vr_lambda,attn.proj,norm1_post,ls1,norm2,mlp.{w12,w3|c_fc,
    c_proj},norm2_post,ls2}, plus token_embedding/reg_tokens/norm_pre/ln_final/pool/
    text_projection. Layer 0 has no vr_lambda (it only produces v_first); the stacked
    layout carries a dummy 0.5 for it.
    """
    tree: Dict[str, Any] = {"token_embedding": sd["token_embedding.weight"]}
    if "reg_tokens" in sd:
        tree["reg_tokens"] = sd["reg_tokens"].reshape(-1, sd["reg_tokens"].shape[-1])
    for name in ("norm_pre", "ln_final"):
        if f"{name}.weight" in sd:
            t = {"scale": sd[f"{name}.weight"]}
            if f"{name}.bias" in sd:
                t["bias"] = sd[f"{name}.bias"]
            tree[name] = t

    block_re = re.compile(r"^blocks\.(\d+)\.(.*)$")
    per_layer: Dict[int, dict] = {}
    kernel_suffixes = {
        "attn.qkv.weight": ("attn", "qkv", "kernel"),
        "attn.qkv.bias": ("attn", "qkv", "bias"),
        "attn.proj.weight": ("attn", "proj", "kernel"),
        "attn.proj.bias": ("attn", "proj", "bias"),
        "attn.gate.weight": ("attn", "gate", "kernel"),
        "attn.gate.bias": ("attn", "gate", "bias"),
        "attn.vr_lambda": ("attn", "vr_lambda"),
        "attn.q_norm.weight": ("attn", "q_norm", "scale"),
        "attn.q_norm.bias": ("attn", "q_norm", "bias"),
        "attn.k_norm.weight": ("attn", "k_norm", "scale"),
        "attn.k_norm.bias": ("attn", "k_norm", "bias"),
        "norm1.weight": ("norm1", "scale"),
        "norm1.bias": ("norm1", "bias"),
        "norm1_post.weight": ("norm1_post", "scale"),
        "norm1_post.bias": ("norm1_post", "bias"),
        "norm2.weight": ("norm2", "scale"),
        "norm2.bias": ("norm2", "bias"),
        "norm2_post.weight": ("norm2_post", "scale"),
        "norm2_post.bias": ("norm2_post", "bias"),
        "ls1.gamma": ("ls1",),
        "ls2.gamma": ("ls2",),
        "mlp.w12.weight": ("mlp", "w12", "kernel"),
        "mlp.w12.bias": ("mlp", "w12", "bias"),
        "mlp.w3.weight": ("mlp", "w3", "kernel"),
        "mlp.w3.bias": ("mlp", "w3", "bias"),
        "mlp.c_fc.weight": ("mlp", "c_fc", "kernel"),
        "mlp.c_fc.bias": ("mlp", "c_fc", "bias"),
        "mlp.c_proj.weight": ("mlp", "c_proj", "kernel"),
        "mlp.c_proj.bias": ("mlp", "c_proj", "bias"),
    }
    for k, v in sd.items():
        m = block_re.match(k)
        if not m:
            continue
        idx, rest = int(m.group(1)), m.group(2)
        if rest not in kernel_suffixes:
            raise KeyError(f"unknown modern-text block key {rest}")
        path = kernel_suffixes[rest]
        val = v.T if rest.endswith(".weight") and ("attn." in rest or "mlp." in rest) and "norm" not in rest else v
        _set(per_layer.setdefault(idx, {}), path, val)

    if per_layer:
        # layer 0 carries no vr_lambda in the reference; pad with the 0.5 init for stacking
        if any("vr_lambda" in p.get("attn", {}) for p in per_layer.values()):
            for p in per_layer.values():
                p["attn"].setdefault("vr_lambda", np.full((1,), 0.5, dtype=np.float32))
        tree["blocks"] = _stack_blocks(per_layer)

    if "pool.query" in sd:
        pool: Dict[str, Any] = {"query": sd["pool.query"].reshape(-1)}
        for name in ("q", "kv"):
            pp = {"kernel": sd[f"pool.{name}.weight"].T}
            if f"pool.{name}.bias" in sd:
                pp["bias"] = sd[f"pool.{name}.bias"]
            pool[name] = pp
        for name in ("q_norm", "k_norm"):
            if f"pool.{name}.weight" in sd:
                t = {"scale": sd[f"pool.{name}.weight"]}
                if f"pool.{name}.bias" in sd:
                    t["bias"] = sd[f"pool.{name}.bias"]
                pool[name] = t
        tree["pool"] = pool

    if "text_projection.weight" in sd:
        tp = {"kernel": sd["text_projection.weight"].T}
        if "text_projection.bias" in sd:
            tp["bias"] = sd["text_projection.bias"]
        tree["text_projection"] = tp
    return _to_jnp(tree)


# ---------------------------------------------------------------------------
# jax -> torch (export / interop)
# ---------------------------------------------------------------------------

def params_to_torch_state_dict(params: Dict[str, Any], custom_text: bool = True) -> Dict[str, np.ndarray]:
    """Flatten the JAX param tree back into a reference-layout torch-style state dict
    (numpy values). Inverse of :func:`torch_clip_to_params` for the transformer families."""
    out: Dict[str, np.ndarray] = {}

    def unstack_blocks(blocks: dict, prefix: str):
        n = None
        flat = _flatten(blocks)
        for path, v in flat.items():
            n = v.shape[0]
            break
        for i in range(n):
            for path, v in flat.items():
                vi = np.asarray(v[i])
                key, val = _block_path_to_torch(path, vi)
                out[f"{prefix}transformer.resblocks.{i}.{key}"] = val

    vis = params.get("visual")
    if vis is not None and "patch_embed" in vis:
        k = np.asarray(vis["patch_embed"]["kernel"])  # (P*P*3, W)
        n_in = k.shape[0] // 3
        p = int(round(np.sqrt(n_in)))
        out["visual.conv1.weight"] = k.reshape(p, p, 3, -1).transpose(3, 2, 0, 1)
        if "class_embedding" in vis:
            out["visual.class_embedding"] = np.asarray(vis["class_embedding"])
        out["visual.positional_embedding"] = np.asarray(vis["positional_embedding"])
        for ln in ("ln_pre", "ln_post"):
            if ln in vis:
                out[f"visual.{ln}.weight"] = np.asarray(vis[ln]["scale"])
                out[f"visual.{ln}.bias"] = np.asarray(vis[ln]["bias"])
        if vis.get("proj") is not None:
            out["visual.proj"] = np.asarray(vis["proj"])
        unstack_blocks(vis["blocks"], "visual.")

    txt = params.get("text")
    if txt is not None:
        prefix = "text." if custom_text else ""
        out[f"{prefix}token_embedding.weight"] = np.asarray(txt["token_embedding"])
        out[f"{prefix}positional_embedding"] = np.asarray(txt["positional_embedding"])
        if "cls_emb" in txt:
            out[f"{prefix}cls_emb"] = np.asarray(txt["cls_emb"])
        out[f"{prefix}ln_final.weight"] = np.asarray(txt["ln_final"]["scale"])
        out[f"{prefix}ln_final.bias"] = np.asarray(txt["ln_final"]["bias"])
        tp = txt.get("text_projection")
        if tp is not None:
            if isinstance(tp, dict):
                out[f"{prefix}text_projection.weight"] = np.asarray(tp["kernel"]).T
                if tp.get("bias") is not None:
                    out[f"{prefix}text_projection.bias"] = np.asarray(tp["bias"])
            else:
                out[f"{prefix}text_projection"] = np.asarray(tp)
        unstack_blocks(txt["blocks"], prefix)

    out["logit_scale"] = np.asarray(params["logit_scale"])
    if "logit_bias" in params:
        out["logit_bias"] = np.asarray(params["logit_bias"])
    return out


def _flatten(tree, prefix=()):
    flat = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            flat.update(_flatten(v, prefix + (k,)))
        else:
            flat[prefix + (k,)] = v
    return flat


def _block_path_to_torch(path, v: np.ndarray):
    mapping = {
        ("ln_1", "scale"): ("ln_1.weight", v),
        ("ln_1", "bias"): ("ln_1.bias", v),
        ("ln_2", "scale"): ("ln_2.weight", v),
        ("ln_2", "bias"): ("ln_2.bias", v),
        ("attn", "qkv", "kernel"): ("attn.in_proj_weight", v.T),
        ("attn", "qkv", "bias"): ("attn.in_proj_bias", v),
        ("attn", "out", "kernel"): ("attn.out_proj.weight", v.T),
        ("attn", "out", "bias"): ("attn.out_proj.bias", v),
        ("mlp", "c_fc", "kernel"): ("mlp.c_fc.weight", v.T),
        ("mlp", "c_fc", "bias"): ("mlp.c_fc.bias", v),
        ("mlp", "c_proj", "kernel"): ("mlp.c_proj.weight", v.T),
        ("mlp", "c_proj", "bias"): ("mlp.c_proj.bias", v),
        ("ls_1",): ("ls_1.gamma", v),
        ("ls_2",): ("ls_2.gamma", v),
    }
    if path in mapping:
        return mapping[path]
    raise KeyError(path)


# ---------------------------------------------------------------------------
# big_vision (SigLIP) .npz import
# ---------------------------------------------------------------------------

def load_big_vision_weights(params: Dict[str, Any], cfg: CLIPModelCfg, checkpoint_path: str) -> Dict[str, Any]:
    """Load official big_vision SigLIP ``.npz`` checkpoints into the native param tree
    (reference load_big_vision_weights, convert.py:13-220).

    big_vision/flax kernels are already (in, out) like ours, so the mapping is mostly
    name translation: per-head q/k/v kernels (W, H, hd) flatten+concat into the fused
    (W, 3W) qkv; the MAP head maps onto the timm AttentionPoolLatent layout this
    framework shares (models/vit.py map_pool / naflex_vit attn_pool).
    """
    w = np.load(checkpoint_path)
    root = "params/" if any(k.startswith("params/") for k in w.files) else ""

    def g(name):
        return np.asarray(w[root + name])

    def fused_qkv(prefix):
        ks = [g(f"{prefix}{n}/kernel") for n in ("query", "key", "value")]  # (W, H, hd)
        bs = [g(f"{prefix}{n}/bias") for n in ("query", "key", "value")]  # (H, hd)
        width = ks[0].shape[0]
        kernel = np.concatenate([k.reshape(width, -1) for k in ks], axis=1)  # (W, 3W)
        bias = np.concatenate([b.reshape(-1) for b in bs])
        return kernel, bias

    def block_tree(prefix, i):
        if f"{root}{prefix}encoderblock/LayerNorm_0/scale" in w.files:
            bp = f"{prefix}encoderblock/"
            sel = lambda a: a[i]
        else:
            bp = f"{prefix}encoderblock_{i}/"
            sel = lambda a: a
        mp = bp + "MultiHeadDotProductAttention_0/"
        qkv_k, qkv_b = fused_qkv(mp) if sel is None else (None, None)
        ks_ = [sel(g(f"{mp}{n}/kernel")) for n in ("query", "key", "value")]
        bs_ = [sel(g(f"{mp}{n}/bias")) for n in ("query", "key", "value")]
        width = ks_[0].shape[0]
        out_k = sel(g(f"{mp}out/kernel")).reshape(-1, width)  # (H*hd, W)
        return {
            "ln_1": {"scale": sel(g(f"{bp}LayerNorm_0/scale")), "bias": sel(g(f"{bp}LayerNorm_0/bias"))},
            "attn": {
                "qkv": {
                    "kernel": np.concatenate([k.reshape(width, -1) for k in ks_], axis=1),
                    "bias": np.concatenate([b.reshape(-1) for b in bs_]),
                },
                "out": {"kernel": out_k, "bias": sel(g(f"{mp}out/bias"))},
            },
            "ln_2": {"scale": sel(g(f"{bp}LayerNorm_1/scale")), "bias": sel(g(f"{bp}LayerNorm_1/bias"))},
            "mlp": {
                "c_fc": {"kernel": sel(g(f"{bp}MlpBlock_0/Dense_0/kernel")), "bias": sel(g(f"{bp}MlpBlock_0/Dense_0/bias"))},
                "c_proj": {"kernel": sel(g(f"{bp}MlpBlock_0/Dense_1/kernel")), "bias": sel(g(f"{bp}MlpBlock_0/Dense_1/bias"))},
            },
        }

    def map_head(prefix):
        bp = f"{prefix}MAPHead_0/"
        mp = bp + "MultiHeadDotProductAttention_0/"
        width = g(f"{bp}probe").shape[-1]
        kv_k = np.concatenate(
            [g(f"{mp}{n}/kernel").reshape(width, -1) for n in ("key", "value")], axis=1
        )
        kv_b = np.concatenate([g(f"{mp}{n}/bias").reshape(-1) for n in ("key", "value")])
        return {
            "latent": g(f"{bp}probe").reshape(-1),
            "q": {"kernel": g(f"{mp}query/kernel").reshape(width, -1), "bias": g(f"{mp}query/bias").reshape(-1)},
            "kv": {"kernel": kv_k, "bias": kv_b},
            "proj": {"kernel": g(f"{mp}out/kernel").reshape(-1, width), "bias": g(f"{mp}out/bias")},
            "norm": {"scale": g(f"{bp}LayerNorm_0/scale"), "bias": g(f"{bp}LayerNorm_0/bias")},
            "mlp": {
                "c_fc": {"kernel": g(f"{bp}MlpBlock_0/Dense_0/kernel"), "bias": g(f"{bp}MlpBlock_0/Dense_0/bias")},
                "c_proj": {"kernel": g(f"{bp}MlpBlock_0/Dense_1/kernel"), "bias": g(f"{bp}MlpBlock_0/Dense_1/bias")},
            },
        }

    from .models.vit import resolve_timm_vision_cfg

    vcfg = resolve_timm_vision_cfg(cfg.vision_cfg) if cfg.vision_cfg.timm_model_name else cfg.vision_cfg
    n_layers = vcfg.layers

    emb_k = g("img/embedding/kernel")  # (P, P, 3, W) or (P*P*3, W)
    if emb_k.ndim == 4:
        emb_k = emb_k.reshape(-1, emb_k.shape[-1])
    pos = g("img/pos_embedding")
    pos = pos.reshape(-1, pos.shape[-1])
    vis: Dict[str, Any] = {
        "patch_embed": {"kernel": emb_k, "bias": g("img/embedding/bias")},
        "positional_embedding": pos,
        "ln_post": {"scale": g("img/Transformer/encoder_norm/scale"), "bias": g("img/Transformer/encoder_norm/bias")},
        "blocks": _stack_blocks({i: block_tree("img/Transformer/", i) for i in range(n_layers)}),
    }
    if f"{root}img/MAPHead_0/probe" in w.files:
        vis["map_pool"] = map_head("img/")

    tcfg = cfg.text_cfg
    txt: Dict[str, Any] = {
        "token_embedding": g("txt/Embed_0/embedding"),
        "positional_embedding": g("txt/pos_embedding").reshape(-1, g("txt/pos_embedding").shape[-1]),
        "ln_final": {"scale": g("txt/Encoder_0/encoder_norm/scale"), "bias": g("txt/Encoder_0/encoder_norm/bias")},
        "blocks": _stack_blocks({i: block_tree("txt/Encoder_0/", i) for i in range(tcfg.layers)}),
    }
    if f"{root}txt/head/kernel" in w.files:
        txt["text_projection"] = {"kernel": g("txt/head/kernel"), "bias": g("txt/head/bias")}

    tree = {
        "visual": vis,
        "text": txt,
        "logit_scale": g("t").reshape(()),
        "logit_bias": g("b").reshape(()),
    }
    from .checkpoint import merge_params

    return merge_params(params, _to_jnp(tree), cfg, strict=False)
