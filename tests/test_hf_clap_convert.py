"""HF (transformers ClapModel) checkpoint conversion parity.

Reference surface: src/open_clip/audio/convert.py:76-123 (convert_hf_clap_state_dict).
Builds a real tiny `transformers.ClapModel` with the HTSAT-tiny geometry + fused patch
embed, converts its state dict into our param tree, and checks audio/text embeddings
match transformers' own get_audio_features / get_text_features.
"""

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models import clap as clap_mod

import jax.numpy as jnp

EMBED = 16

HF_TEXT = {
    "model_type": "roberta",
    "vocab_size": 100,
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 2,
    "intermediate_size": 64,
    "max_position_embeddings": 64,
    "pad_token_id": 1,
    "type_vocab_size": 1,
    "layer_norm_eps": 1e-12,
}

OCT_CFG = {
    "embed_dim": EMBED,
    "audio_cfg": {
        "model_type": "HTSAT", "model_name": "tiny", "sample_rate": 48000,
        "mel_bins": 64, "window_size": 1024, "hop_size": 480, "fmin": 50, "fmax": 14000,
        "clip_samples": 480000, "audio_length": 1024,
        "enable_fusion": True, "fusion_type": "aff_2d",
        "proj_act": "relu",  # HF ClapProjectionLayer projection_hidden_act default
    },
    "text_cfg": {
        "context_length": 16, "vocab_size": 100, "pad_id": 1,
        "hf_model_config": HF_TEXT,
        "hf_pooler_type": "cls_pooler", "hf_proj_type": "clap_mlp",
    },
    "custom_text": True,
}


@pytest.fixture(scope="module")
def hf_model():
    from transformers import ClapAudioConfig, ClapConfig, ClapModel, ClapTextConfig

    torch.manual_seed(11)
    ac = ClapAudioConfig(
        window_size=8, spec_size=256, patch_stride=[4, 4], patch_size=4,
        patch_embeds_hidden_size=96, depths=[2, 2, 6, 2],
        num_attention_heads=[4, 8, 16, 32], hidden_size=768, num_mel_bins=64,
        enable_fusion=True, projection_dim=EMBED, num_hidden_layers=4,
    )
    tc = ClapTextConfig(projection_dim=EMBED, **{k: v for k, v in HF_TEXT.items()
                                                 if k != "model_type"})
    cfg = ClapConfig(audio_config=ac.to_dict(), text_config=tc.to_dict(),
                     projection_dim=EMBED)
    m = ClapModel(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def converted(hf_model):
    name = "tiny-hf-clap"
    if name not in oct.list_models():
        oct.add_model_config(dict(OCT_CFG), name=name)
    cfg = parse_model_cfg(name)
    params = clap_mod.hf_clap_to_params(hf_model.state_dict(), cfg)
    # HF checkpoints carry no token-semantic head (tscam); merge over init like the
    # reference's non-strict load
    from open_clip_tpu.models.clip import init_clip
    import jax

    init = init_clip(jax.random.PRNGKey(0), cfg)
    from open_clip_tpu.checkpoint import merge_params

    params = merge_params(init, params, strict=False)
    return cfg, params


def test_hf_clap_text_parity(hf_model, converted):
    cfg, params = converted
    rng = np.random.default_rng(3)
    ids = rng.integers(4, 99, size=(2, 16)).astype(np.int64)
    ids[:, 0] = 0  # CLS
    with torch.no_grad():
        t_feats = hf_model.get_text_features(input_ids=torch.from_numpy(ids),
                                             attention_mask=torch.ones(2, 16, dtype=torch.long))
    from open_clip_tpu.models.clip import encode_text

    # HF get_text_features L2-normalizes (modeling_clap.ClapModel.get_text_features)
    j_feats = encode_text(params, cfg, jnp.asarray(ids.astype(np.int32)), normalize=True)
    a, b = np.asarray(j_feats), t_feats.numpy()
    np.testing.assert_allclose(a, b, atol=2e-4)


def test_hf_clap_audio_parity(hf_model, converted):
    cfg, params = converted
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, 4, 1001, 64)).astype(np.float32)
    longer = np.array([True, False])
    with torch.no_grad():
        t_feats = hf_model.get_audio_features(
            input_features=torch.from_numpy(mel),
            is_longer=torch.from_numpy(longer)[:, None],
        )
    # HF get_audio_features L2-normalizes too
    j_feats = clap_mod.encode_audio(
        params, cfg, {"mel_fusion": jnp.asarray(mel), "longer": jnp.asarray(longer)},
        normalize=True)
    a, b = np.asarray(j_feats), t_feats.numpy()
    cos = (a * b).sum(-1) / np.linalg.norm(a, axis=-1) / np.linalg.norm(b, axis=-1)
    assert cos.min() > 1 - 5e-4, cos
    np.testing.assert_allclose(a, b, atol=5e-3)
