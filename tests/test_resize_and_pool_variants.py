"""Pos-embed resize on checkpoint load (force_image_size / force_context_length) and the
CoCa-paper attentional-pool variants ('parallel'/'cascade') vs the torch reference."""

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

TINY = {
    "embed_dim": 32,
    "custom_text": True,
    "vision_cfg": {"image_size": 64, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module")
def ref():
    return install_reference()


def _register(ref, tmp_path_factory, name, cfg):
    if name not in oct.list_models():
        oct.add_model_config(dict(cfg), name=name)
    if ref is not None and name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(cfg))
        ref.add_model_config(p)
    return name


def test_force_image_size_resize_parity(ref, tmp_path_factory, tmp_path, rng):
    """Loading a 64px checkpoint into a 96px model must bicubic-resize the pos embed the
    same way the reference does (reference resize_pos_embed, model.py:790-822)."""
    name = _register(ref, tmp_path_factory, "tiny-resize", TINY)
    torch.manual_seed(13)
    t_src = ref.create_model(name)
    path = tmp_path / "src.pt"
    torch.save({"state_dict": t_src.state_dict()}, path)

    t_big = ref.create_model(name, force_image_size=96)
    ref.load_checkpoint(t_big, str(path))
    t_big.eval()

    model = oct.create_model(name, pretrained=str(path), force_image_size=96)
    img = rng.standard_normal((2, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = t_big.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    j_feat = model.encode_image(img)
    a, b = np.asarray(j_feat), t_feat.numpy()
    cos = (a * b).sum(-1) / np.linalg.norm(a, axis=-1) / np.linalg.norm(b, axis=-1)
    assert cos.min() > 1 - 1e-4, cos
    np.testing.assert_allclose(a, b, atol=5e-3)  # interpolation backends differ slightly


def test_force_context_length_resize(rng, tmp_path, ref, tmp_path_factory):
    name = _register(ref, tmp_path_factory, "tiny-resize", TINY)
    torch.manual_seed(14)
    t_src = ref.create_model(name)
    path = tmp_path / "src.pt"
    torch.save({"state_dict": t_src.state_dict()}, path)
    model = oct.create_model(name, pretrained=str(path), force_context_length=24)
    assert model.params["text"]["positional_embedding"].shape[0] == 24
    txt = rng.integers(1, 63, size=(2, 24)).astype(np.int32)
    feats = model.encode_text(txt, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("pool_variant", ["parallel", "cascade"])
def test_attentional_pool_variants_parity(ref, tmp_path_factory, rng, pool_variant):
    """CoCa-paper pooling variants (reference transformer.py:817-832)."""
    cfg_dict = {
        "embed_dim": 32,
        "custom_text": True,
        "vision_cfg": {
            "image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
            "attentional_pool": pool_variant, "attn_pooler_queries": 6, "attn_pooler_heads": 2,
        },
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
    }
    name = _register(ref, tmp_path_factory, f"tiny-pool-{pool_variant}", cfg_dict)
    torch.manual_seed(15)
    tmodel = ref.create_model(name)
    tmodel.eval()
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded
    params = merge_params(params, loaded, cfg, strict=True)

    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_feat = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    # the reference's parallel/cascade path is marked "untested, WIP" and leaves the
    # single contrastive query unsqueezed as (B, 1, D); we return the sane (B, D)
    t = t_feat.numpy()
    if t.ndim == 3:
        t = t[:, 0]
    j_feat = oct.encode_image(params, cfg, img)
    np.testing.assert_allclose(np.asarray(j_feat), t, atol=5e-5)
