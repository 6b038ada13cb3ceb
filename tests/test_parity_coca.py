"""CoCa parity vs the torch reference: contrastive latents + decoder logits, and a
generation smoke test on the jitted fixed-shape sampler."""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.checkpoint import merge_params
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.convert import torch_clip_to_params
from open_clip_tpu.models import coca
from open_clip_tpu.models.clip import init_clip

from .reference_stubs import install_reference

import jax

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


@pytest.fixture(scope="module")
def ref():
    return install_reference()


@pytest.fixture(scope="module")
def pair(ref, tmp_path_factory):
    name = "tiny-parity-coca"
    if name not in oct.list_models():
        oct.add_model_config(dict(TINY_COCA), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(TINY_COCA))
        ref.add_model_config(p)
    torch.manual_seed(21)
    tmodel = ref.create_model(name)
    tmodel.eval()
    # the reference's MultimodalTransformer never calls its init_parameters (and it would
    # crash if it did: it references self.transformer.*), leaving text_projection as
    # torch.empty garbage; give it sane values so logits are comparable at float tolerance
    with torch.no_grad():
        torch.nn.init.normal_(tmodel.text_decoder.text_projection, std=0.02)
    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded
    params = merge_params(params, loaded, cfg, strict=True)
    return tmodel, cfg, params


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    txt = rng.integers(3, 63, size=(2, 12)).astype(np.int64)
    txt[0, 8:] = 0  # padding
    return img, txt


def test_coca_forward_parity(pair):
    tmodel, cfg, params = pair
    img, txt = _inputs()
    with torch.no_grad():
        t_out = tmodel(image=torch.from_numpy(img).permute(0, 3, 1, 2), text=torch.from_numpy(txt))
    j_out = oct.clip_forward(params, cfg, img, txt.astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(j_out["image_features"]), t_out["image_features"].numpy(), atol=5e-5
    )
    np.testing.assert_allclose(
        np.asarray(j_out["text_features"]), t_out["text_features"].numpy(), atol=5e-5
    )
    np.testing.assert_allclose(np.asarray(j_out["logits"]), t_out["logits"].numpy(), atol=2e-4)


def test_coca_generate_matches_reference_greedy(pair):
    tmodel, cfg, params = pair
    img, _ = _inputs(1)
    # reference greedy = beam_search num_beams=1? use top_k k=1 deterministic sampling
    with torch.no_grad():
        t_ids = tmodel.generate(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            seq_len=8, min_seq_len=3, generation_type="top_k", top_k=1,
            sot_token_id=61, eos_token_id=62, pad_token_id=0,
        )
    j_ids = coca.generate(
        params, cfg, img, seq_len=8, min_seq_len=3, generation_type="greedy",
        sot_token_id=61, eos_token_id=62, pad_token_id=0,
    )
    j = np.asarray(j_ids)
    t = t_ids.numpy()
    # compare up to the generated length of the shorter (reference stops at eos)
    L = min(j.shape[1], t.shape[1])
    np.testing.assert_array_equal(j[:, :L], t[:, :L])


def test_coca_generate_shapes_and_eos(pair):
    _, cfg, params = pair
    img, _ = _inputs(2)
    ids = coca.generate(
        params, cfg, img, rng=jax.random.PRNGKey(0), seq_len=10, min_seq_len=2,
        generation_type="top_p", top_p=0.9, temperature=1.0,
        sot_token_id=61, eos_token_id=62, pad_token_id=0,
    )
    ids = np.asarray(ids)
    assert ids.shape == (2, 10)
    assert (ids[:, 0] == 61).all()


def test_coca_beam_search_matches_reference(pair):
    tmodel, cfg, params = pair
    img, _ = _inputs(4)
    with torch.no_grad():
        t_ids = tmodel.generate(
            torch.from_numpy(img).permute(0, 3, 1, 2),
            seq_len=8, min_seq_len=3, generation_type="beam_search", num_beams=3,
            num_beam_groups=1, sot_token_id=61, eos_token_id=62, pad_token_id=0,
        )
    j_ids = coca.generate_beam(
        params, cfg, img, seq_len=8, min_seq_len=3, num_beams=3,
        sot_token_id=61, eos_token_id=62, pad_token_id=0,
    )
    j = np.asarray(j_ids)
    t = t_ids.numpy()
    L = min(j.shape[1], t.shape[1])
    np.testing.assert_array_equal(j[:, :L], t[:, :L])
