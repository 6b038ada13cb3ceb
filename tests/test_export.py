"""Serving export: StableHLO artifacts round-trip and match the live model.

No reference analogue (the reference serves through torch); this is the
TPU-native deployment path — jax.export with baked weights + symbolic batch.
"""

import numpy as np
import pytest

import open_clip_tpu as oct

# NOT in the quick tier: the jax.export round-trips are ~100 s of compiles on a
# 1-core box (measured via --durations); serving-export regressions are caught
# by the full suite

TINY = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
    "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32, "heads": 2, "layers": 2},
}


@pytest.fixture(scope="module")
def tiny_model():
    if "tiny-export-vit" not in oct.list_models():
        oct.add_model_config(dict(TINY), name="tiny-export-vit")
    model, _, _ = oct.create_model_and_transforms("tiny-export-vit")
    return model


def test_export_round_trip_matches_model(tiny_model, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(1, 511, size=(3, 16)).astype(np.int32)

    oct.save_exported(tiny_model, str(tmp_path / "artifact"))
    loaded = oct.load_exported(str(tmp_path / "artifact"))

    np.testing.assert_allclose(
        np.asarray(loaded.encode_image(img)),
        np.asarray(tiny_model.encode_image(img, normalize=True)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loaded.encode_text(txt)),
        np.asarray(tiny_model.encode_text(txt, normalize=True)), atol=1e-5)

    # symbolic batch: same artifact serves a different batch size
    img5 = rng.standard_normal((5, 32, 32, 3)).astype(np.float32)
    assert np.asarray(loaded.encode_image(img5)).shape == (5, 32)

    # logits path matches the live model's get_logits
    lpi, _ = loaded.get_logits(img, txt)
    ref_lpi, _ = tiny_model.get_logits(img, txt)
    np.testing.assert_allclose(np.asarray(lpi), np.asarray(ref_lpi), atol=1e-4)

    # the artifact is model-code-free: config records the essentials
    assert loaded.meta["embed_dim"] == 32
    assert loaded.meta["context_length"] == 16


def test_export_static_batch_rejects_other_batch(tiny_model, tmp_path):
    oct.save_exported(tiny_model, str(tmp_path / "static"), static_batch=2)
    loaded = oct.load_exported(str(tmp_path / "static"))
    rng = np.random.default_rng(1)
    ok = loaded.encode_image(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    assert np.asarray(ok).shape == (2, 32)
    with pytest.raises(Exception):
        loaded.encode_image(rng.standard_normal((4, 32, 32, 3)).astype(np.float32))


def test_export_rejects_patch_dict_towers(tmp_path):
    if "tiny-export-naflex" not in oct.list_models():
        oct.add_model_config({
            "embed_dim": 32,
            "vision_cfg": {"timm_model_name": "naflexvit_base_patch16_gap",
                           "timm_model_pretrained": False, "image_size": 32},
            "text_cfg": {"context_length": 16, "vocab_size": 512, "width": 32,
                         "heads": 2, "layers": 2},
        }, name="tiny-export-naflex")
    try:
        model, _, _ = oct.create_model_and_transforms("tiny-export-naflex")
    except Exception:
        pytest.skip("naflex config unavailable in this environment")
    with pytest.raises(ValueError):
        oct.export_encoders(model)


TINY_COCA = {
    "embed_dim": 32,
    "custom_text": True,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16,
                   "head_width": 16, "attentional_pool": True, "attn_pooler_queries": 9,
                   "attn_pooler_heads": 4, "output_tokens": True},
    "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2,
                 "layers": 2, "embed_cls": True, "output_tokens": True},
    "multimodal_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2,
                       "layers": 2, "attn_pooler_heads": 2},
}

COCA_IDS = dict(sot_token_id=60, eos_token_id=61, pad_token_id=0)


def test_export_coca_captioner_round_trip(tmp_path):
    """CoCa artifacts carry the whole KV-cached decode loop; exported beam output
    matches the live model, across batch sizes (symbolic batch)."""
    from open_clip_tpu.models import coca

    if "tiny-export-coca" not in oct.list_models():
        oct.add_model_config(dict(TINY_COCA), name="tiny-export-coca")
    model = oct.create_model("tiny-export-coca", load_weights=False)

    rng = np.random.default_rng(1)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    oct.save_exported(model, str(tmp_path / "artifact"),
                      captioner={"seq_len": 8, "min_seq_len": 2, **COCA_IDS})
    loaded = oct.load_exported(str(tmp_path / "artifact"))
    assert loaded.meta["captioner"]["generation_type"] == "beam"

    live = np.asarray(coca.generate_beam(
        model.params, model.cfg, img, seq_len=8, min_seq_len=2, num_beams=6, **COCA_IDS))
    exported = np.asarray(loaded.generate(img))
    np.testing.assert_array_equal(exported, live)

    img4 = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    assert np.asarray(loaded.generate(img4)).shape == (4, 8)

    # encoders still round-trip on the CoCa artifact
    np.testing.assert_allclose(
        np.asarray(loaded.encode_image(img)),
        np.asarray(model.encode_image(img, normalize=True)), atol=1e-5)


def test_export_genlip_captioner_in_memory():
    """GenLIP captioner exports (patch-dict input, pinned image_tokens) and the
    serialized module reproduces live greedy decode."""
    from jax import export as jexport

    from open_clip_tpu.export import export_captioner
    from open_clip_tpu.models import genlip as G

    model = oct.create_model("naflexgenlip_test", load_weights=False)
    ni = 8
    exp = export_captioner(model, seq_len=6, generation_type="greedy", image_tokens=ni)
    rt = jexport.deserialize(bytearray(bytes(exp.serialize())))

    rng = np.random.default_rng(2)
    coord = np.stack([np.arange(ni) // 4, np.arange(ni) % 4], -1).astype(np.int32)
    patches = (rng.standard_normal((2, ni, 768)) * 0.1).astype(np.float32)
    pc = np.broadcast_to(coord, (2, ni, 2)).copy()
    pv = np.ones((2, ni), bool)

    import jax.numpy as jnp

    got = np.asarray(rt.call(jnp.asarray(patches), jnp.asarray(pc), jnp.asarray(pv),
                             jnp.uint32(0)))
    live = np.asarray(G.generate(
        model.params, model.cfg,
        {"patches": patches, "patch_coord": pc, "patch_valid": pv}, seq_len=6))
    np.testing.assert_array_equal(got, live)
