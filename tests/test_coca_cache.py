"""CoCa KV-cached incremental decode parity: generate(kv_cache=True) must equal the
re-encode-everything loop token-for-token, across sampling modes, padded batches, and
repetition penalty."""

import numpy as np
import pytest

import jax

import open_clip_tpu as oct
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models import coca
from open_clip_tpu.models.clip import init_clip

TINY_COCA = {
    "embed_dim": 32,
    "custom_text": True,
    "vision_cfg": {
        "image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16,
        "attentional_pool": True, "attn_pooler_queries": 9, "attn_pooler_heads": 4,
        "output_tokens": True,
    },
    "text_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
        "embed_cls": True, "output_tokens": True,
    },
    "multimodal_cfg": {
        "context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2,
        "attn_pooler_heads": 2,
    },
}

GEN_KW = dict(sot_token_id=60, eos_token_id=61, pad_token_id=0)


@pytest.fixture(scope="module")
def model():
    name = "tiny-cache-coca"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY_COCA), name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(3), cfg)
    return cfg, params


def _images(b, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(b, 32, 32, 3)).astype(np.float32) * 0.5


@pytest.mark.parametrize("gen_type,kw", [
    ("greedy", {}),
    ("top_k", {"top_k": 3, "temperature": 0.8}),
    ("top_p", {"top_p": 0.9, "temperature": 1.2}),
    ("greedy", {"repetition_penalty": 1.4}),
])
def test_cached_matches_uncached(model, gen_type, kw):
    cfg, params = model
    image = _images(3)
    rng = jax.random.PRNGKey(11)
    slow = np.asarray(coca.generate(
        params, cfg, image, rng, seq_len=10, min_seq_len=3,
        generation_type=gen_type, kv_cache=False, **GEN_KW, **kw))
    fast = np.asarray(coca.generate(
        params, cfg, image, rng, seq_len=10, min_seq_len=3,
        generation_type=gen_type, kv_cache=True, **GEN_KW, **kw))
    np.testing.assert_array_equal(fast, slow)


@pytest.mark.parametrize("length_penalty", [1.0, 0.7])
def test_cached_beam_matches_uncached(model, length_penalty):
    cfg, params = model
    image = _images(2, seed=9)
    slow = np.asarray(coca.generate_beam(
        params, cfg, image, seq_len=9, min_seq_len=3, num_beams=3,
        length_penalty=length_penalty, kv_cache=False, **GEN_KW))
    fast = np.asarray(coca.generate_beam(
        params, cfg, image, seq_len=9, min_seq_len=3, num_beams=3,
        length_penalty=length_penalty, kv_cache=True, **GEN_KW))
    np.testing.assert_array_equal(fast, slow)


def test_eos_then_pad(model):
    cfg, params = model
    image = _images(2, seed=4)
    out = np.asarray(coca.generate(params, cfg, image, seq_len=10, min_seq_len=2,
                                   **GEN_KW))
    for row in out:
        eos = np.where(row == 61)[0]
        if eos.size:
            assert (row[eos[0] + 1:] == 0).all()


@pytest.mark.parametrize("variant", [
    {"scaled_cosine_attn": True},
    {"scale_heads": True},
    {"scale_attn_inner": True},
    {"qk_norm": True, "scale_heads": True, "scale_attn_inner": True},
])
def test_cached_matches_uncached_exotic_attention(variant):
    """Round-4: the cached decode path supports the CustomResidualAttentionBlock
    variants (scaled-cosine / NormFormer head-scale / Sub-LN inner norm) that
    round 3 gated behind NotImplementedError."""
    # the variants live on the TEXT tower (reference CustomTextCLIP custom blocks;
    # the multimodal decoder is plain ResidualAttentionBlocks in the reference
    # too, coca_model.py:97-101) — the cached decode loop runs the text tower
    # incrementally, which is where the round-3 gate fired
    cfg_dict = dict(TINY_COCA)
    cfg_dict["text_cfg"] = {**TINY_COCA["text_cfg"], **variant}
    name = "tiny-cache-coca-" + "-".join(sorted(variant))
    if name not in oct.list_models():
        oct.add_model_config(cfg_dict, name=name)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(5), cfg)

    imgs = _images(3, seed=4)
    rng = jax.random.PRNGKey(7)
    slow = coca.generate(params, cfg, imgs, rng, seq_len=8,
                         generation_type="greedy", kv_cache=False, **GEN_KW)
    fast = coca.generate(params, cfg, imgs, rng, seq_len=8,
                         generation_type="greedy", kv_cache=True, **GEN_KW)
    np.testing.assert_array_equal(np.asarray(slow), np.asarray(fast))
