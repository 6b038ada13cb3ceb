"""Interop: hub export round-trips into the torch reference; big_vision npz import;
local-dir: loading; profiler sanity."""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models.clip import init_clip
from open_clip_tpu.push_to_hf_hub import save_for_hf

from .reference_stubs import install_reference

import jax
import jax.numpy as jnp

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
}


def _register(ref, tmp_path_factory, name, cfg):
    if name not in oct.list_models():
        oct.add_model_config(dict(cfg), name=name)
    if ref is not None and name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(cfg))
        ref.add_model_config(p)
    return name


def test_save_for_hf_roundtrip_into_reference(tmp_path, tmp_path_factory, rng):
    """Weights trained here must load in the torch reference with identical embeddings."""
    ref = install_reference()
    cfg_dict = dict(TINY)
    cfg_dict["custom_text"] = True
    name = _register(ref, tmp_path_factory, "tiny-interop", cfg_dict)

    model = oct.create_model(name, seed=3)
    out_dir = save_for_hf(model, str(tmp_path / "export"), model_config=oct.get_model_config(name))
    assert (tmp_path / "export" / "open_clip_model.safetensors").exists()
    assert (tmp_path / "export" / "open_clip_config.json").exists()

    tmodel = ref.create_model(name)
    from safetensors.torch import load_file

    sd = load_file(str(tmp_path / "export" / "open_clip_model.safetensors"))
    missing, unexpected = tmodel.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("attn_mask" in k for k in missing), missing
    tmodel.eval()

    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(2, 12)).astype(np.int64)
    with torch.no_grad():
        t_img = tmodel.encode_image(torch.from_numpy(img).permute(0, 3, 1, 2))
        t_txt = tmodel.encode_text(torch.from_numpy(txt))
    j_img = model.encode_image(img)
    j_txt = model.encode_text(txt.astype(np.int32))
    np.testing.assert_allclose(np.asarray(j_img), t_img.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=2e-5)


def test_local_dir_loading(tmp_path, rng):
    """create_model('local-dir:...') loads the exported artifact set."""
    name = _register(None, None, "tiny-interop2", TINY)
    model = oct.create_model(name, seed=7)
    save_for_hf(model, str(tmp_path / "repo"), model_config=oct.get_model_config(name))

    loaded = oct.create_model(f"local-dir:{tmp_path / 'repo'}")
    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(loaded.encode_image(img)), np.asarray(model.encode_image(img)), atol=1e-6
    )


def test_big_vision_npz_import(tmp_path, rng):
    """Synthetic big_vision-layout npz loads into a native siglip-style model and the
    fused-qkv/MAP-head mappings produce a working forward."""
    from open_clip_tpu.convert import load_big_vision_weights

    name = "tiny-bv-siglip"
    cfg_dict = {
        "embed_dim": 32,
        "init_logit_bias": -10,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                       "head_width": 16, "class_token": False, "pool_type": "map", "no_ln_pre": True},
        "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2,
                     "layers": 2, "no_causal_mask": True, "pool_type": "last", "proj_bias": True},
    }
    if name not in oct.list_models():
        oct.add_model_config(cfg_dict, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)

    # synthesize a big_vision npz with the right names/shapes
    w, heads, hd, L, hidden = 32, 2, 16, 2, 128
    arr = {}
    arr["img/embedding/kernel"] = rng.standard_normal((16, 16, 3, w)).astype(np.float32) * 0.02
    arr["img/embedding/bias"] = np.zeros(w, np.float32)
    arr["img/pos_embedding"] = rng.standard_normal((1, 4, w)).astype(np.float32) * 0.02
    arr["img/Transformer/encoder_norm/scale"] = np.ones(w, np.float32)
    arr["img/Transformer/encoder_norm/bias"] = np.zeros(w, np.float32)
    for side, nl, hidden_d in (("img/Transformer/", 2, w * 4), ("txt/Encoder_0/", 2, w * 4)):
        for i in range(nl):
            bp = f"{side}encoderblock_{i}/"
            mp = bp + "MultiHeadDotProductAttention_0/"
            for n in ("query", "key", "value"):
                arr[f"{mp}{n}/kernel"] = rng.standard_normal((w, heads, hd)).astype(np.float32) * 0.05
                arr[f"{mp}{n}/bias"] = np.zeros((heads, hd), np.float32)
            arr[f"{mp}out/kernel"] = rng.standard_normal((heads, hd, w)).astype(np.float32) * 0.05
            arr[f"{mp}out/bias"] = np.zeros(w, np.float32)
            arr[f"{bp}LayerNorm_0/scale"] = np.ones(w, np.float32)
            arr[f"{bp}LayerNorm_0/bias"] = np.zeros(w, np.float32)
            arr[f"{bp}LayerNorm_1/scale"] = np.ones(w, np.float32)
            arr[f"{bp}LayerNorm_1/bias"] = np.zeros(w, np.float32)
            arr[f"{bp}MlpBlock_0/Dense_0/kernel"] = rng.standard_normal((w, hidden_d)).astype(np.float32) * 0.05
            arr[f"{bp}MlpBlock_0/Dense_0/bias"] = np.zeros(hidden_d, np.float32)
            arr[f"{bp}MlpBlock_0/Dense_1/kernel"] = rng.standard_normal((hidden_d, w)).astype(np.float32) * 0.05
            arr[f"{bp}MlpBlock_0/Dense_1/bias"] = np.zeros(w, np.float32)
    bp = "img/MAPHead_0/"
    mp = bp + "MultiHeadDotProductAttention_0/"
    arr[f"{bp}probe"] = rng.standard_normal((1, 1, w)).astype(np.float32) * 0.05
    for n in ("query", "key", "value"):
        arr[f"{mp}{n}/kernel"] = rng.standard_normal((w, heads, hd)).astype(np.float32) * 0.05
        arr[f"{mp}{n}/bias"] = np.zeros((heads, hd), np.float32)
    arr[f"{mp}out/kernel"] = rng.standard_normal((heads, hd, w)).astype(np.float32) * 0.05
    arr[f"{mp}out/bias"] = np.zeros(w, np.float32)
    arr[f"{bp}LayerNorm_0/scale"] = np.ones(w, np.float32)
    arr[f"{bp}LayerNorm_0/bias"] = np.zeros(w, np.float32)
    arr[f"{bp}MlpBlock_0/Dense_0/kernel"] = rng.standard_normal((w, 128)).astype(np.float32) * 0.05
    arr[f"{bp}MlpBlock_0/Dense_0/bias"] = np.zeros(128, np.float32)
    arr[f"{bp}MlpBlock_0/Dense_1/kernel"] = rng.standard_normal((128, w)).astype(np.float32) * 0.05
    arr[f"{bp}MlpBlock_0/Dense_1/bias"] = np.zeros(w, np.float32)
    arr["txt/Embed_0/embedding"] = rng.standard_normal((64, w)).astype(np.float32) * 0.02
    arr["txt/pos_embedding"] = rng.standard_normal((1, 12, w)).astype(np.float32) * 0.02
    arr["txt/Encoder_0/encoder_norm/scale"] = np.ones(w, np.float32)
    arr["txt/Encoder_0/encoder_norm/bias"] = np.zeros(w, np.float32)
    arr["txt/head/kernel"] = rng.standard_normal((w, 32)).astype(np.float32) * 0.05
    arr["txt/head/bias"] = np.zeros(32, np.float32)
    arr["t"] = np.asarray([4.6], np.float32)
    arr["b"] = np.asarray([-12.9], np.float32)
    path = tmp_path / "siglip.npz"
    np.savez(path, **arr)

    loaded = load_big_vision_weights(params, cfg, str(path))
    # the fused qkv must equal manual concat of the per-head kernels
    q = arr["img/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel"].reshape(w, -1)
    got = np.asarray(loaded["visual"]["blocks"]["attn"]["qkv"]["kernel"][0][:, :w])
    np.testing.assert_allclose(got, q, atol=1e-7)
    assert float(loaded["logit_scale"]) == pytest.approx(4.6)
    assert float(loaded["logit_bias"]) == pytest.approx(-12.9)

    img = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 63, size=(1, 12)).astype(np.int32)
    out = oct.clip_forward(loaded, cfg, img, txt)
    assert np.isfinite(np.asarray(out["image_features"])).all()


def test_profiler_matches_reference_static_numbers():
    from open_clip_tpu.train.profiler import profile_model

    row = profile_model("ViT-B-32")
    assert row["params (M)"] == pytest.approx(151.28, abs=0.01)  # reference model_profile.csv:8
    assert row["GFLOPs"] == pytest.approx(14.78, rel=0.05)  # XLA counts a few extra elementwise ops


def test_hf_hub_model_resolution(tmp_path, monkeypatch, rng):
    """create_model('hf-hub:org/repo') resolves config + weights from a (mocked local)
    hub cache and reproduces the exported model's embeddings (reference factory.py:92-152)."""
    name = "tiny-hub"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY, custom_text=True), name=name)
    model = oct.create_model(name, seed=7)
    out_dir = tmp_path / "hubrepo"
    save_for_hf(model, str(out_dir), model_config=oct.get_model_config(name))

    def fake_download(repo_id, filename, cache_dir=None, **kw):
        assert repo_id == "acme/tiny-hub"
        p = out_dir / filename
        if not p.exists():
            raise FileNotFoundError(filename)
        return str(p)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_download)

    m2 = oct.create_model("hf-hub:acme/tiny-hub")
    img = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    a = np.asarray(model.encode_image(img, normalize=True))
    b = np.asarray(m2.encode_image(img, normalize=True))
    np.testing.assert_allclose(a, b, atol=1e-5)

    tok = oct.get_tokenizer("hf-hub:acme/tiny-hub")
    assert tok is not None


def test_pretrained_registry_breadth():
    """Full reference table parity: >=112 model families, hub/url per tag."""
    prs = oct.list_pretrained()
    models = {m for m, _ in prs}
    assert len(models) >= 112, len(models)
    assert len(prs) >= 195, len(prs)
    assert ("ViT-B-32", "laion2b_s34b_b79k") in prs
    assert ("ViT-SO400M-14-SigLIP", "webli") in prs
    assert ("MobileCLIP-S1", "datacompdr") in prs
    from open_clip_tpu.pretrained import get_pretrained_cfg

    cfg = get_pretrained_cfg("ViT-B-32", "laion2b_s34b_b79k")
    assert cfg["hf_hub"].startswith("laion/")
    assert tuple(cfg["preprocess_cfg"]["mean"])
