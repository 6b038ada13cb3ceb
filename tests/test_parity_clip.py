"""Embedding-parity tests against the reference torch implementation.

Methodology mirrors the reference's inference regression tests (reference
tests/util_test.py:141-224): build a reference model with seeded random weights on CPU,
convert its state dict through convert.py, and require near-identical embeddings on the
same inputs. This validates both the converter and the model math end to end.

One full-size ViT-B-32 check runs the real thing; the remaining paths (quick_gelu,
round-trip export, file loading, bf16) run on a tiny config for speed (single-core CI).
"""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.checkpoint import merge_params
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.convert import params_to_torch_state_dict, torch_clip_to_params
from open_clip_tpu.models.clip import init_clip

from .reference_stubs import install_reference

import jax

TINY_CFG = {
    "embed_dim": 64,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64, "patch_size": 16, "head_width": 32},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 64, "heads": 2, "layers": 2},
}


def _cosine(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    return (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))


@pytest.fixture(scope="module")
def ref():
    return install_reference()


def _register_tiny(ref, tmp_path_factory):
    name = "tiny-parity-vit"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY_CFG), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(TINY_CFG))
        ref.add_model_config(p)
    return name


def _make_pair(ref, model_name, seed=42, **create_kw):
    torch.manual_seed(seed)
    tmodel = ref.create_model(model_name, **create_kw)
    tmodel.eval()
    sd = tmodel.state_dict()

    cfg = parse_model_cfg(model_name)
    if create_kw.get("force_quick_gelu"):
        cfg.quick_gelu = True
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(sd, cfg)
    assert "_unconverted" not in loaded, loaded.get("_unconverted")
    params = merge_params(params, loaded, cfg, strict=True)
    return tmodel, cfg, params


@pytest.fixture(scope="module")
def tiny_pair(ref, tmp_path_factory):
    name = _register_tiny(ref, tmp_path_factory)
    return (name,) + _make_pair(ref, name)


def _tiny_inputs(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 500, size=(2, 16)).astype(np.int32)
    txt[:, 0] = 510  # fake sot
    txt[:, -1] = 511  # fake eot (highest id -> argmax pool picks it)
    return img, txt


def test_vitb32_embedding_parity(ref):
    """The keystone full-size check (BASELINE parity metric methodology)."""
    tmodel, cfg, params = _make_pair(ref, "ViT-B-32")

    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    tok = oct.get_tokenizer("ViT-B-32")
    txt = tok(["a photo of a cat", "a diagram of the solar system"])

    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tmodel.encode_text(torch.from_numpy(txt.astype(np.int64)))

    j_img = oct.encode_image(params, cfg, img)
    j_txt = oct.encode_text(params, cfg, txt)

    assert _cosine(j_img, t_img.numpy()).min() > 1 - 1e-5
    assert _cosine(j_txt, t_txt.numpy()).min() > 1 - 1e-5
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=2e-4)


def test_tiny_forward_dict_parity(tiny_pair):
    _, tmodel, cfg, params = tiny_pair
    img, txt = _tiny_inputs(1)
    with torch.no_grad():
        t_imf, t_txf, t_scale = tmodel(
            image=torch.from_numpy(img).permute(0, 3, 1, 2), text=torch.from_numpy(txt.astype(np.int64))
        )
    out = oct.clip_forward(params, cfg, img, txt)
    np.testing.assert_allclose(np.asarray(out["image_features"]), t_imf.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["text_features"]), t_txf.numpy(), atol=2e-5)
    np.testing.assert_allclose(float(out["logit_scale"]), float(t_scale), rtol=1e-6)


def test_tiny_quick_gelu_parity(ref, tmp_path_factory):
    name = _register_tiny(ref, tmp_path_factory)
    tmodel, cfg, params = _make_pair(ref, name, seed=3, force_quick_gelu=True)
    img, txt = _tiny_inputs(2)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    j_img = oct.encode_image(params, cfg, img)
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=2e-5)


def test_tiny_state_dict_roundtrip(tiny_pair):
    """jax->torch export must reproduce the original state dict."""
    _, tmodel, cfg, params = tiny_pair
    sd_orig = {k: v.numpy() for k, v in tmodel.state_dict().items() if "attn_mask" not in k}
    sd_back = params_to_torch_state_dict(params, custom_text=False)
    missing = set(sd_orig) - set(sd_back)
    assert not missing, f"roundtrip missing {sorted(missing)[:10]}"
    for k in sd_orig:
        np.testing.assert_allclose(sd_back[k], sd_orig[k], atol=1e-6, err_msg=k)


def test_tiny_checkpoint_file_loading(tiny_pair, tmp_path):
    """Full path: torch.save -> factory create_model(pretrained=file)."""
    name, tmodel, cfg, params = tiny_pair
    path = tmp_path / "ckpt.pt"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    model = oct.create_model(name, pretrained=str(path))
    img, _ = _tiny_inputs(3)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
    j_img = oct.encode_image(model.params, model.cfg, img)
    assert _cosine(np.asarray(j_img), t_img.numpy()).min() > 1 - 1e-6


def test_tiny_bf16_compute_close(tiny_pair):
    """bf16 compute path stays within bf16 tolerance of the fp32 path."""
    _, _, cfg, params = tiny_pair
    img, _ = _tiny_inputs(5)
    import jax.numpy as jnp

    j32 = oct.encode_image(params, cfg, img, normalize=True)
    jbf = oct.encode_image(params, cfg, img, normalize=True, compute_dtype=jnp.bfloat16)
    cos = _cosine(np.asarray(jbf, dtype=np.float32), np.asarray(j32))
    assert cos.min() > 1 - 5e-3
