"""ModifiedResNet parity vs the torch reference (converter + NHWC conv/BN/attnpool math)."""

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

TINY_RN = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 64, "layers": [1, 1, 1, 1], "width": 16, "patch_size": None, "head_width": 64},
    "text_cfg": {"context_length": 16, "vocab_size": 256, "width": 64, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module")
def ref():
    return install_reference()


def _register(ref, tmp_path_factory):
    name = "tiny-parity-rn"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY_RN), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(TINY_RN))
        ref.add_model_config(p)
    return name


def test_tiny_resnet_parity(ref, tmp_path_factory):
    name = _register(ref, tmp_path_factory)
    torch.manual_seed(11)
    tmodel = ref.create_model(name)
    tmodel.eval()

    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    params = merge_params(params, loaded, cfg, strict=True)

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    j_img = oct.encode_image(params, cfg, img)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=5e-4)


@pytest.mark.slow
def test_rn50_parity(ref):
    torch.manual_seed(12)
    tmodel = ref.create_model("RN50")
    tmodel.eval()
    cfg = parse_model_cfg("RN50")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    params = merge_params(params, loaded, cfg, strict=True)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((1, 224, 224, 3)).astype(np.float32)
    txt = rng.integers(1, 49405, size=(1, 77)).astype(np.int64)
    txt[:, -1] = 49407
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tmodel.encode_text(torch.from_numpy(txt))
    j_img = oct.encode_image(params, cfg, img)
    j_txt = oct.encode_text(params, cfg, txt.astype(np.int32))

    def cos(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        return (a * b).sum(-1) / np.linalg.norm(a, axis=-1) / np.linalg.norm(b, axis=-1)

    assert cos(j_img, t_img.numpy()).min() > 1 - 1e-5
    assert cos(j_txt, t_txt.numpy()).min() > 1 - 1e-5
