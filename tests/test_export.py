"""Serving export: StableHLO artifacts round-trip and match the live model.

No reference analogue (the reference serves through torch); this is the
TPU-native deployment path — jax.export with baked weights + symbolic batch.
"""

import numpy as np
import pytest

import open_clip_tpu as oct

pytestmark = pytest.mark.quick

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
