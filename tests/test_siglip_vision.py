"""Native SigLIP vision towers (timm-name resolution, MAP pooling, no class token)."""

import numpy as np
import pytest

import jax
import open_clip_tpu as oct
from open_clip_tpu.config import CLIPVisionCfg, parse_model_cfg
from open_clip_tpu.models import vit
from open_clip_tpu.models.clip import init_clip


def test_resolve_timm_siglip_names():
    cfg = CLIPVisionCfg(timm_model_name="vit_base_patch16_siglip_224", image_size=224, timm_proj="none")
    r = vit.resolve_timm_vision_cfg(cfg)
    assert (r.width, r.layers, r.heads, r.patch_size) == (768, 12, 12, 16)
    assert not r.class_token and r.pool_type == "map" and r.no_ln_pre

    cfg = CLIPVisionCfg(timm_model_name="vit_so400m_patch14_siglip_384", image_size=384)
    r = vit.resolve_timm_vision_cfg(cfg)
    assert (r.width, r.layers, r.patch_size) == (1152, 27, 14)

    with pytest.raises(NotImplementedError):
        vit.resolve_timm_vision_cfg(CLIPVisionCfg(timm_model_name="convnext_base"))


def test_siglip_config_registry_buildable():
    raw = oct.get_model_config("ViT-B-16-SigLIP")
    assert raw["init_logit_bias"] == -10
    assert raw["vision_cfg"]["timm_model_name"].startswith("vit_base_patch16_siglip")


def test_tiny_siglip_style_forward(rng):
    name = "tiny-siglip-style"
    if name not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 64,
                "init_logit_bias": -10,
                "custom_text": True,
                "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16,
                               "head_width": 32, "class_token": False, "pool_type": "map",
                               "no_ln_pre": True},
                "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 64, "heads": 2,
                             "layers": 2, "no_causal_mask": True, "pool_type": "last",
                             "proj_bias": True},
            },
            name=name,
        )
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    assert "map_pool" in params["visual"]
    assert "class_embedding" not in params["visual"]

    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(2, 12)).astype(np.int32)
    out = oct.clip_forward(params, cfg, img, txt)
    assert out["image_features"].shape == (2, 64)
    assert float(out["logit_bias"]) == -10.0
    # pooled features differ across distinct images (MAP pool actually attends)
    assert not np.allclose(np.asarray(out["image_features"][0]), np.asarray(out["image_features"][1]))
