"""Custom-block feature parity (reference CustomResidualAttentionBlock,
transformer.py:333-440): qk-norm, NormFormer head scales, inner/post attention norms,
MLP norm, LayerScale — all in one tiny tower vs the torch reference."""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.checkpoint import merge_params
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.convert import torch_clip_to_params
from open_clip_tpu.models.clip import init_clip

from .reference_stubs import install_reference

import jax

CUSTOM = {
    "embed_dim": 32,
    "custom_text": True,
    "vision_cfg": {
        "image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
        "qk_norm": True, "scale_heads": True, "scale_attn_inner": True, "scale_attn": True,
        "scale_fc": True, "ls_init_value": 0.1,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
        "qk_norm": True, "scale_heads": True,
    },
}


def test_custom_block_parity(tmp_path_factory, rng):
    ref = install_reference()
    name = "tiny-custom-blocks"
    if name not in oct.list_models():
        oct.add_model_config(dict(CUSTOM), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(CUSTOM))
        ref.add_model_config(p)

    torch.manual_seed(77)
    tmodel = ref.create_model(name)
    tmodel.eval()
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded, loaded.get("_unconverted")
    params = merge_params(params, loaded, cfg, strict=True)

    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tmodel.encode_text(torch.from_numpy(txt))
    j_img = oct.encode_image(params, cfg, img)
    j_txt = oct.encode_text(params, cfg, txt.astype(np.int32))
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=5e-5)


SCALED_COSINE = {
    "embed_dim": 32,
    "custom_text": True,
    "vision_cfg": {
        "image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
        "scaled_cosine_attn": True, "scale_heads": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
        "scaled_cosine_attn": True,
    },
}


def test_scaled_cosine_attn_parity(tmp_path_factory, rng):
    ref = install_reference()
    name = "tiny-scaled-cosine"
    if name not in oct.list_models():
        oct.add_model_config(dict(SCALED_COSINE), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(SCALED_COSINE))
        ref.add_model_config(p)

    torch.manual_seed(78)
    tmodel = ref.create_model(name)
    tmodel.eval()
    # make the learned logit scales non-trivial so parity covers the clamp+exp path
    with torch.no_grad():
        for m in tmodel.modules():
            if hasattr(m, "logit_scale") and isinstance(getattr(m, "logit_scale"), torch.nn.Parameter):
                if m.logit_scale is not None and m.logit_scale.ndim == 3:
                    m.logit_scale.normal_(2.0, 1.5)  # some values exceed the clamp
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    assert params["visual"]["blocks"]["attn"]["logit_scale"].shape == (2, 2)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded, loaded.get("_unconverted")
    params = merge_params(params, loaded, cfg, strict=True)

    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tmodel.encode_text(torch.from_numpy(txt))
    j_img = oct.encode_image(params, cfg, img)
    j_txt = oct.encode_text(params, cfg, txt.astype(np.int32))
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=5e-5)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=5e-5)
