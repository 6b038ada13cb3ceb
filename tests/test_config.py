import pytest

import open_clip_tpu as oct
from open_clip_tpu.config import CLIPModelCfg, parse_model_cfg


def test_list_models_nonempty():
    models = oct.list_models()
    assert len(models) >= 150
    assert "ViT-B-32" in models
    assert "RN50" in models
    assert "coca_ViT-B-32" in models


def test_get_model_config_roundtrip():
    cfg = oct.get_model_config("ViT-B-32")
    assert cfg["embed_dim"] == 512
    assert cfg["vision_cfg"]["width"] == 768
    assert cfg["vision_cfg"]["patch_size"] == 32
    # mutating the returned dict must not corrupt the registry
    cfg["embed_dim"] = 1
    assert oct.get_model_config("ViT-B-32")["embed_dim"] == 512


def test_parse_model_cfg():
    cfg = parse_model_cfg("ViT-L-14")
    assert cfg.embed_dim == 768
    assert cfg.vision_cfg.layers == 24
    assert cfg.vision_cfg.heads == 16  # 1024 / 64
    assert cfg.text_cfg.context_length == 77


def test_parse_resnet_cfg():
    cfg = parse_model_cfg("RN50")
    assert cfg.vision_cfg.is_resnet
    assert cfg.vision_cfg.layers == (3, 4, 6, 3)


def test_add_model_config_dict():
    oct.add_model_config(
        {"embed_dim": 64, "vision_cfg": {"layers": 2, "width": 64, "patch_size": 16, "image_size": 32},
         "text_cfg": {"layers": 2, "width": 64, "heads": 2, "vocab_size": 100, "context_length": 8}},
        name="tiny-test-model",
    )
    assert "tiny-test-model" in oct.list_models()
    cfg = parse_model_cfg("tiny-test-model")
    assert cfg.vision_cfg.layers == 2


def test_name_slash_normalization():
    assert oct.get_model_config("ViT-B/32") is not None


def test_unknown_model():
    assert oct.get_model_config("does-not-exist-xyz") is None
    with pytest.raises(RuntimeError):
        parse_model_cfg("does-not-exist-xyz")


def test_forward_intermediates():
    import numpy as np
    import jax
    from open_clip_tpu.config import parse_model_cfg
    from open_clip_tpu.models.clip import forward_intermediates, init_clip

    cfg = parse_model_cfg("tiny-test-model") if oct.get_model_config("tiny-test-model") else None
    if cfg is None:
        oct.add_model_config(
            {"embed_dim": 64, "vision_cfg": {"layers": 2, "width": 64, "patch_size": 16, "image_size": 32},
             "text_cfg": {"layers": 2, "width": 64, "heads": 2, "vocab_size": 100, "context_length": 8}},
            name="tiny-test-model",
        )
        cfg = parse_model_cfg("tiny-test-model")
    params = init_clip(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 99, size=(2, 8)).astype(np.int32)
    out = forward_intermediates(params, cfg, img, txt, image_indices=[0, 1], text_indices=[1])
    assert len(out["image_intermediates"]) == 2
    assert out["image_intermediates"][0].shape == (2, 4, 64)  # prefix split off
    assert out["image_intermediates_prefix"][0].shape == (2, 1, 64)
    assert len(out["text_intermediates"]) == 1
    assert out["image_features"].shape == (2, 64)


def test_validate_special_tokens_and_pure_precision():
    """get_tokenizer fails fast on special-token drift (reference factory.py:705-744);
    pure_bf16 casts linear kernels but keeps norm affines fp32."""
    import jax
    import jax.numpy as jnp
    import pytest

    import open_clip_tpu as oct

    oct.add_model_config({
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": 1, "width": 16, "patch_size": 16, "head_width": 16},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 16, "heads": 2, "layers": 1,
                     "text_arch": "modern", "pool_type": "argmax", "eos_id": 123},
    }, name="tok-probe-cfg")
    with pytest.raises(ValueError, match="eos"):
        oct.get_tokenizer("tok-probe-cfg")
    assert oct.get_tokenizer("ViT-B-32") is not None

    m = oct.create_model("ViT-S-32", load_weights=False, precision="pure_bf16")
    assert m.params["visual"]["blocks"]["attn"]["qkv"]["kernel"].dtype == jnp.bfloat16
    assert m.params["visual"]["blocks"]["ln_1"]["scale"].dtype == jnp.float32
    assert m.params["logit_scale"].dtype == jnp.float32
