"""HF text tower (Flax transformers) — offline config-dict construction + poolers."""

import numpy as np
import pytest

import jax
import open_clip_tpu as oct
from open_clip_tpu.config import CLIPTextCfg, parse_model_cfg
from open_clip_tpu.models import hf_text
from open_clip_tpu.models.clip import init_clip

TINY_ROBERTA = {
    "model_type": "roberta",
    "vocab_size": 100,
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "max_position_embeddings": 40,
    "pad_token_id": 1,
}


@pytest.mark.parametrize("pooler", ["mean_pooler", "cls_pooler", "max_pooler"])
def test_hf_text_tower_poolers(rng, pooler):
    cfg = CLIPTextCfg(
        hf_model_config=dict(TINY_ROBERTA), hf_pooler_type=pooler, hf_proj_type="mlp",
        pad_id=1, context_length=16,
    )
    params = hf_text.init_hf_text_tower(jax.random.PRNGKey(0), cfg, 24)
    txt = rng.integers(2, 99, size=(2, 16)).astype(np.int32)
    txt[0, 10:] = 1  # padding
    pooled, tokens = hf_text.apply_hf_text_tower(params, cfg, txt)
    assert pooled.shape == (2, 24)
    assert tokens.shape == (2, 16, 32)

    if pooler == "mean_pooler":
        # padding must not affect the masked mean
        txt2 = txt.copy()
        txt2[0, 12:] = 1
        p2, _ = hf_text.apply_hf_text_tower(params, cfg, txt2)
        np.testing.assert_allclose(np.asarray(pooled[1]), np.asarray(p2[1]), atol=1e-6)


def test_hf_text_in_clip_container(rng):
    name = "tiny-hf-clip"
    if name not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 24,
                "custom_text": True,
                "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
                "text_cfg": {"hf_model_config": dict(TINY_ROBERTA), "hf_pooler_type": "mean_pooler",
                             "hf_proj_type": "linear", "pad_id": 1, "context_length": 16,
                             "vocab_size": 100},
            },
            name=name,
        )
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(2, 99, size=(2, 16)).astype(np.int32)
    out = oct.clip_forward(params, cfg, img, txt)
    assert out["text_features"].shape == (2, 24)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["text_features"]), axis=-1), 1.0, atol=1e-5
    )
