"""Vision Transformer tower — TPU-native.

Functional re-design of reference ``src/open_clip/transformer.py:592-930``
(VisionTransformer): images flow as NHWC; patch embedding is an explicit
unfold + single MXU matmul (equivalent to the reference's stride==kernel Conv2d,
but shaped as one big GEMM); the depth loop is a stacked ``lax.scan``
(see models/blocks.py). Pooling supports tok/avg/none, final-LN placement,
and the attentional-pooler variants used by CoCa (reference transformer.py:251,
:683-724).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import CLIPVisionCfg, to_2tuple
from ..ops.layers import layer_norm, linear
from ..ops.attention import multi_head_attention
from ..ops.pos_embed import get_2d_sincos_pos_embed
from . import blocks as B


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_attentional_pooler(key, d_model: int, context_dim: int, n_queries: int) -> Dict[str, Any]:
    """AttentionalPooler params (reference transformer.py:251-273): latent queries +
    MHA with kdim=vdim=context_dim (separate q/k/v projections, matching nn.MHA layout)."""
    ks = jax.random.split(key, 6)
    return {
        "query": jax.random.normal(ks[0], (n_queries, d_model)),
        "attn": {
            "q": {"kernel": B.xavier_uniform(ks[1], (d_model, d_model)), "bias": jnp.zeros((d_model,))},
            "k": {"kernel": B.xavier_uniform(ks[2], (context_dim, d_model)), "bias": jnp.zeros((d_model,))},
            "v": {"kernel": B.xavier_uniform(ks[3], (context_dim, d_model)), "bias": jnp.zeros((d_model,))},
            "out": B.torch_linear_init(ks[4], d_model, d_model),
        },
        "ln_q": B._ln_params(d_model),
        "ln_k": B._ln_params(context_dim),
    }


def apply_attentional_pooler(p: Dict[str, Any], x: jax.Array, *, n_head: int, norm_eps: float = 1e-5) -> jax.Array:
    """(B, L, context_dim) -> (B, n_queries, d_model)."""
    bsz = x.shape[0]
    k = layer_norm(x, p["ln_k"]["scale"], p["ln_k"]["bias"], eps=norm_eps)
    q = layer_norm(p["query"].astype(x.dtype), p["ln_q"]["scale"], p["ln_q"]["bias"], eps=norm_eps)
    q = jnp.broadcast_to(q[None], (bsz, *q.shape))
    return multi_head_attention(p["attn"], q, kv=k, num_heads=n_head)


def resolve_timm_vision_cfg(cfg: CLIPVisionCfg) -> CLIPVisionCfg:
    """Map a reference timm-tower name to a native CLIPVisionCfg where the architecture
    is a plain ViT (SigLIP family: no class token, MAP attention-pool head, patch-embed
    bias). The reference outsources these to timm (model.py:171-210); here they are the
    same native tower with different pooling/token options."""
    import dataclasses as _dc
    import re as _re

    name = cfg.timm_model_name or ""
    if name.startswith("vit_base_mci"):
        # MobileCLIP-B trunk (reference MobileCLIP-B.json / MobileCLIP2-B.json):
        # ViT-B/16 with a 4-conv MCi stem replacing the patchify
        return _dc.replace(
            cfg,
            timm_model_name=None,
            layers=12, width=768, head_width=64, mlp_ratio=4.0, patch_size=16,
            image_size=cfg.image_size or 224,
            class_token=True, pool_type="tok", no_ln_pre=True,
            # timm hybrid ConvStem: patchify-style stages (kernel == stride),
            # widths width/4 -> width/2 -> width, total stride 16
            conv_stem_channels=(192, 384, 768),
            conv_stem_strides=(4, 2, 2),
            norm_kwargs={"eps": 1e-6},
        )
    mc = _re.match(r"vit_([a-z0-9]+)_patch(\d+)_clip(?:_quickgelu)?_?(\d+)?", name)
    if mc:
        # plain timm CLIP ViT trunk (e.g. MobileCLIP2-L-14's vit_large_patch14_clip_224,
        # reference model_configs/MobileCLIP2-L-14.json): class token, pre-LN, token pool
        sizes = {
            "base": (768, 12, 12, 4.0),
            "large": (1024, 24, 16, 4.0),
            "huge": (1280, 32, 16, 4.0),
        }
        if mc.group(1) not in sizes:
            raise NotImplementedError(f"unknown clip vit size {mc.group(1)!r}")
        width, layers, heads, mlp_ratio = sizes[mc.group(1)]
        res = int(mc.group(3)) if mc.group(3) else (
            cfg.image_size if isinstance(cfg.image_size, int) else 224)
        return _dc.replace(
            cfg,
            timm_model_name=None,
            layers=layers,
            width=width,
            head_width=width // heads,
            mlp_ratio=mlp_ratio,
            patch_size=int(mc.group(2)),
            image_size=cfg.image_size or res,
            class_token=True,
            pool_type="tok",
            norm_kwargs={"eps": 1e-6},
        )
    mg = _re.match(r"vit_([a-z0-9]+)_patch(\d+)_gap_?(\d+)?", name)
    if mg:
        # timm gap ViT (vit_medium_patch16_gap_256.json): no class token, avg pool,
        # fc_norm after pooling
        sizes = {"medium": (512, 12, 8, 4.0), "base": (768, 12, 12, 4.0)}
        if mg.group(1) not in sizes:
            raise NotImplementedError(f"unknown gap vit size {mg.group(1)!r}")
        width, layers, heads, mlp_ratio = sizes[mg.group(1)]
        res = int(mg.group(3)) if mg.group(3) else (
            cfg.image_size if isinstance(cfg.image_size, int) else 224)
        return _dc.replace(
            cfg,
            timm_model_name=None,
            layers=layers, width=width, head_width=width // heads, mlp_ratio=mlp_ratio,
            patch_size=int(mg.group(2)), image_size=cfg.image_size or res,
            class_token=False, no_ln_pre=True, pool_type="avg",
            final_ln_after_pool=True, norm_kwargs={"eps": 1e-6},
        )
    m = _re.match(r"vit_([a-z0-9]+)_patch(\d+)_siglip(?:_\w+)?_?(\d+)?", name)
    if not m:
        raise NotImplementedError(f"timm vision tower {name!r} has no native TPU implementation yet")
    sizes = {
        "base": (768, 12, 12, 4.0),
        "large": (1024, 24, 16, 4.0),
        "so400m": (1152, 27, 16, 4304 / 1152),
        "giantopt": (1536, 40, 16, 4.0),
    }
    if m.group(1) not in sizes:
        raise NotImplementedError(f"unknown siglip vit size {m.group(1)!r}")
    width, layers, heads, mlp_ratio = sizes[m.group(1)]
    res = int(m.group(3)) if m.group(3) else (cfg.image_size if isinstance(cfg.image_size, int) else 224)
    return _dc.replace(
        cfg,
        timm_model_name=None,
        layers=layers,
        width=width,
        head_width=width // heads,
        mlp_ratio=mlp_ratio,
        patch_size=int(m.group(2)),
        image_size=cfg.image_size or res,
        class_token=False,
        no_ln_pre=True,
        # siglip towers carry a MAP attention-pool head (the registry configs all set
        # timm_pool="map"); only an explicit gap request selects masked avg
        pool_type="avg" if cfg.timm_pool == "gap" else "map",
        norm_kwargs={"eps": 1e-6},
    )


def init_vision_tower(key, cfg: CLIPVisionCfg, embed_dim: int) -> Dict[str, Any]:
    assert not cfg.is_resnet, "use models/resnet.py for ModifiedResNet configs"
    no_head_proj = False
    from_timm = bool(cfg.timm_model_name)
    if cfg.timm_model_name:
        no_head_proj = cfg.timm_proj == "none"
        cfg = resolve_timm_vision_cfg(cfg)
    width = cfg.width
    heads = cfg.heads
    gh, gw = cfg.grid_size
    seq = gh * gw + (1 if cfg.class_token else 0)
    ph, pw = to_2tuple(cfg.patch_size)
    scale = width ** -0.5

    ks = jax.random.split(key, 8)
    p: Dict[str, Any] = {}
    if cfg.conv_stem_channels:
        # MCi hybrid stem (timm vit_base_mci_224): patchify-style conv (kernel ==
        # stride) + BN + GELU per entry, then a 1x1 width projection (stored as the
        # patch_embed matmul kernel)
        chans = cfg.conv_stem_channels
        strides = cfg.conv_stem_strides or (2,) * len(chans)
        stem = []
        cin = 3
        for i, (c, st) in enumerate(zip(chans, strides)):
            sk = jax.random.fold_in(ks[0], i)
            stem.append({
                "conv": {"kernel": B.normal_init(sk, (st, st, cin, c),
                                                 (st * st * cin) ** -0.5)},
                "bn": {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
                       "mean": jnp.zeros((c,)), "var": jnp.ones((c,))},
            })
            cin = c
        p["conv_stem"] = stem
        p["patch_embed"] = {"kernel": B.normal_init(jax.random.fold_in(ks[0], 99),
                                                    (cin, width), cin ** -0.5),
                            "bias": jnp.zeros((width,))}
    else:
        # patch embedding: kernel (ph*pw*3, width) = flattened HWIO conv kernel
        p["patch_embed"] = {"kernel": B.normal_init(ks[0], (ph * pw * 3, width), scale)}
        if not cfg.class_token or from_timm:
            # timm trunks (and siglip-style towers) use a biased patch embed;
            # the native OpenAI-style ViT conv has no bias
            p["patch_embed"]["bias"] = jnp.zeros((width,))
    if cfg.class_token:
        p["class_embedding"] = B.normal_init(ks[1], (width,), scale)
    if cfg.pos_embed_type == "learnable":
        p["positional_embedding"] = B.normal_init(ks[2], (seq, width), scale)
    elif cfg.pos_embed_type == "sin_cos_2d":
        assert gh == gw, "sin_cos_2d requires square grid"
        p["positional_embedding"] = jnp.asarray(
            get_2d_sincos_pos_embed(width, gh, cls_token=cfg.class_token)
        )
    else:
        raise ValueError(f"unknown pos_embed_type {cfg.pos_embed_type}")

    if not cfg.no_ln_pre:
        p["ln_pre"] = B._ln_params(width)

    p["blocks"] = B.init_block_stack(
        ks[3], cfg.layers, width, heads, int(width * cfg.mlp_ratio),
        ls_init_value=cfg.ls_init_value, init_scheme="vision",
        qk_norm=cfg.qk_norm, scaled_cosine=cfg.scaled_cosine_attn,
        scale_heads=cfg.scale_heads,
        scale_attn_inner=cfg.scale_attn_inner, scale_attn=cfg.scale_attn,
        scale_fc=cfg.scale_fc,
    )

    pool_dim = width
    if cfg.attentional_pool:
        if isinstance(cfg.attentional_pool, str):  # 'parallel' | 'cascade'
            p["attn_pool"] = init_attentional_pooler(ks[4], embed_dim, width, cfg.attn_pooler_queries)
            p["attn_pool_contrastive"] = init_attentional_pooler(ks[5], embed_dim, width, 1)
        else:
            p["attn_pool"] = init_attentional_pooler(ks[4], embed_dim, width, cfg.attn_pooler_queries)
        pool_dim = embed_dim
    elif cfg.pool_type == "map":
        # timm AttentionPoolLatent head (siglip family) — shared shape with naflex_vit
        kp = jax.random.split(ks[4], 5)
        hidden = int(width * 4.0)
        p["map_pool"] = {
            "latent": B.normal_init(kp[0], (width,), scale),
            "q": B.torch_linear_init(kp[1], width, width),
            "kv": B.torch_linear_init(kp[2], width, 2 * width),
            "proj": B.torch_linear_init(kp[3], width, width),
            "norm": B._ln_params(width),
            "mlp": {
                "c_fc": B.torch_linear_init(jax.random.fold_in(kp[4], 0), width, hidden),
                "c_proj": B.torch_linear_init(jax.random.fold_in(kp[4], 1), hidden, width),
            },
        }

    p["ln_post"] = B._ln_params(pool_dim)
    if not no_head_proj:
        p["proj"] = B.normal_init(ks[6], (pool_dim, embed_dim), scale)
    return p


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def patchify(x: jax.Array, patch_size) -> jax.Array:
    """(B, H, W, 3) NHWC -> (B, gh*gw, ph*pw*3) patch tokens.

    Equivalent to the reference's Conv2d(stride=patch) + flatten (transformer.py:632-638,
    799-802) but expressed as reshape/transpose so the embedding is one large matmul."""
    ph, pw = to_2tuple(patch_size)
    b, h, w, c = x.shape
    gh, gw = h // ph, w // pw
    if gh * ph != h or gw * pw != w:
        # non-divisible input (e.g. SO400M-14 at 384: 384/14 -> grid 27): a strided
        # Conv2d floors the grid and drops the trailing pixels — crop to match
        x = x[:, : gh * ph, : gw * pw]
    x = x.reshape(b, gh, ph, gw, pw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, ph, pw, c)
    return x.reshape(b, gh * gw, ph * pw * c)


def patch_dropout(key, x: jax.Array, prob: float, num_prefix: int = 1) -> jax.Array:
    """Randomly keep a (1-prob) fraction of patch tokens per sample, preserving prefix
    tokens (reference PatchDropout, transformer.py:17-58)."""
    if prob <= 0.0:
        return x
    b, l, d = x.shape
    num_patches = l - num_prefix
    keep = max(1, int(num_patches * (1.0 - prob)))
    noise = jax.random.uniform(key, (b, num_patches))
    ids = jnp.argsort(noise, axis=1)[:, :keep]  # random subset per sample
    patches = x[:, num_prefix:]
    kept = jnp.take_along_axis(patches, ids[..., None], axis=1)
    return jnp.concatenate([x[:, :num_prefix], kept], axis=1)


def apply_vision_tower(
    params: Dict[str, Any],
    cfg: CLIPVisionCfg,
    x: jax.Array,  # (B, H, W, 3) normalized NHWC
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    compute_dtype: jnp.dtype = jnp.float32,
    remat: bool = False,
    attn_impl: str = "auto",
    act: str = "gelu",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (pooled (B, embed_dim), tokens (B, L, width))."""
    if cfg.timm_model_name:
        cfg = resolve_timm_vision_cfg(cfg)
    eps = cfg.norm_eps

    x = x.astype(compute_dtype)
    if "conv_stem" in params:
        # MCi hybrid stem: patchify-style conv (kernel == stride, VALID) + BN (eval
        # affine) + GELU per stage, then the 1x1 width projection via the
        # patch_embed matmul
        from ..ops.layers import gelu as _gelu

        for st in params["conv_stem"]:
            kk = st["conv"]["kernel"].shape[0]
            x = jax.lax.conv_general_dilated(
                x, st["conv"]["kernel"].astype(x.dtype), (kk, kk), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            inv = jax.lax.rsqrt(st["bn"]["var"].astype(jnp.float32) + 1e-5)
            sc = (st["bn"]["scale"].astype(jnp.float32) * inv).astype(x.dtype)
            bi = (st["bn"]["bias"].astype(jnp.float32)
                  - st["bn"]["mean"].astype(jnp.float32)
                  * st["bn"]["scale"].astype(jnp.float32) * inv).astype(x.dtype)
            x = _gelu(x * sc + bi)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
    else:
        x = patchify(x, cfg.patch_size)
    x = jnp.dot(x, params["patch_embed"]["kernel"].astype(compute_dtype))
    if params["patch_embed"].get("bias") is not None:
        x = x + params["patch_embed"]["bias"].astype(x.dtype)

    num_prefix = 0
    if cfg.class_token:
        cls = params["class_embedding"].astype(compute_dtype)
        cls = jnp.broadcast_to(cls[None, None, :], (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        num_prefix = 1

    x = x + params["positional_embedding"][: x.shape[1]].astype(compute_dtype)

    if train and cfg.patch_dropout > 0.0:
        assert rng is not None, "patch_dropout requires an rng in training mode"
        x = patch_dropout(rng, x, cfg.patch_dropout, num_prefix=num_prefix)

    if "ln_pre" in params:
        x = layer_norm(x, params["ln_pre"]["scale"], params["ln_pre"]["bias"], eps=eps)

    x = B.apply_transformer(
        params["blocks"], x, heads=cfg.heads, act=act, norm_eps=eps,
        remat=remat, attn_impl=attn_impl,
    )

    pooled, tokens = _pool(params, cfg, x, eps=eps)
    if params.get("proj") is not None:
        pooled = jnp.dot(pooled, params["proj"].astype(pooled.dtype))
        if params.get("proj_bias") is not None:
            pooled = pooled + params["proj_bias"].astype(pooled.dtype)
    return pooled, tokens


def _global_pool(cfg: CLIPVisionCfg, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    skip = 1 if cfg.class_token else 0
    if cfg.pool_type == "avg":
        return x[:, skip:].mean(axis=1), x[:, skip:]
    if cfg.pool_type == "tok":
        return x[:, 0], x[:, 1:]
    return x, x  # 'none'


def _pool(params, cfg: CLIPVisionCfg, x: jax.Array, *, eps: float) -> Tuple[jax.Array, jax.Array]:
    """Pooling incl. attentional-pool variants, mirroring reference _pool
    (transformer.py:817-842)."""
    ln_post = lambda y: layer_norm(y, params["ln_post"]["scale"], params["ln_post"]["bias"], eps=eps)
    if "map_pool" in params:
        from .naflex_vit import _apply_map_pool

        x = ln_post(x)
        valid = jnp.ones(x.shape[:2], bool)
        pooled = _apply_map_pool(params["map_pool"], x, valid, heads=cfg.heads, eps=eps, act="gelu")
        return pooled, x
    if "attn_pool" in params:
        if "attn_pool_contrastive" in params:
            # parallel/cascade CoCa-paper style pooling
            x = ln_post(x)
            tokens = apply_attentional_pooler(params["attn_pool"], x, n_head=cfg.attn_pooler_heads, norm_eps=eps)
            if cfg.attentional_pool == "parallel":
                pooled = apply_attentional_pooler(
                    params["attn_pool_contrastive"], x, n_head=cfg.attn_pooler_heads, norm_eps=eps
                )
            else:  # cascade
                pooled = apply_attentional_pooler(
                    params["attn_pool_contrastive"], tokens, n_head=cfg.attn_pooler_heads, norm_eps=eps
                )
            return pooled[:, 0], tokens
        # original OpenCLIP CoCa setup
        x = apply_attentional_pooler(params["attn_pool"], x, n_head=cfg.attn_pooler_heads, norm_eps=eps)
        x = ln_post(x)
        # pool over queries: tok/avg on the pooled latents (class_token irrelevant here)
        if cfg.pool_type == "tok":
            return x[:, 0], x[:, 1:]
        if cfg.pool_type == "avg":
            return x.mean(axis=1), x
        return x, x
    if cfg.final_ln_after_pool:
        pooled, tokens = _global_pool(cfg, x)
        return ln_post(pooled), tokens
    x = ln_post(x)
    return _global_pool(cfg, x)
