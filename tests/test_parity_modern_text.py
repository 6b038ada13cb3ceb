"""ModernTextTransformer parity vs the torch reference, across feature combinations
(RoPE, SwiGLU/relu2, rmsnorm/layernorm, gated attn, qk-norm, value residual, registers,
sandwich norms, eos/mean/map pooling, causal/bidirectional). Equivalent coverage to the
reference's tests/test_modern_text.py, but checked against the reference itself."""

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

BASE_TEXT = {
    "text_arch": "modern",
    "context_length": 16,
    "variable_text": True,
    "vocab_size": 128,
    "width": 64,
    "heads": 4,
    "layers": 3,
    "mlp_ratio": 2.0,
    "pad_id": 0,
    "eos_id": 2,
    "pool_type": "eos",
    "attention_mode": "causal",
    "pos_embed": "rope",
    "mlp_type": "swiglu",
    "norm_type": "rmsnorm",
    "norm_eps": 1e-6,
}

VARIANTS = {
    "mt-base": {},
    "mt-gated-qk": {"attn_gated": True, "qk_norm": True},
    "mt-bidir-map": {"attention_mode": "bidirectional", "pool_type": "map", "reg_tokens": 2},
    "mt-sandwich-ln": {
        "norm_type": "layernorm", "norm_placement": "sandwich", "mlp_type": "mlp",
        "pool_type": "mean", "attention_mode": "bidirectional", "pre_norm": True,
    },
    "mt-vres-relu2": {"value_residual": True, "mlp_type": "relu2", "attention_bias": True,
                      "proj_bias": True, "ls_init_value": 0.1},
}


@pytest.fixture(scope="module")
def ref():
    return install_reference()


def _register(ref, tmp_path_factory, name, text_overrides):
    cfg = {
        "embed_dim": 48,
        "custom_text": True,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 32, "patch_size": 16, "head_width": 16},
        "text_cfg": {**BASE_TEXT, **text_overrides},
    }
    if name not in oct.list_models():
        oct.add_model_config(dict(cfg), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(cfg))
        ref.add_model_config(p)
    return name


def _tokens(seed=0):
    rng = np.random.default_rng(seed)
    txt = rng.integers(3, 127, size=(3, 16)).astype(np.int64)
    txt[0, 10:] = 0  # padded row
    txt[0, 9] = 2  # eos present
    txt[1, 5] = 2  # eos mid-sequence
    txt[2, :] = rng.integers(3, 127, size=16)  # no eos: fallback to last valid
    return txt


@pytest.mark.parametrize("variant", list(VARIANTS))
def test_modern_text_parity(ref, tmp_path_factory, variant):
    name = _register(ref, tmp_path_factory, f"tiny-{variant}", VARIANTS[variant])
    torch.manual_seed(hash(variant) % 2 ** 31)
    tmodel = ref.create_model(name)
    tmodel.eval()

    cfg = parse_model_cfg(name)
    params = init_clip(jax.random.PRNGKey(0), cfg)
    loaded = torch_clip_to_params(tmodel.state_dict(), cfg)
    assert "_unconverted" not in loaded
    params = merge_params(params, loaded, cfg, strict=True)

    txt = _tokens()
    with torch.no_grad():
        t_txt = tmodel.encode_text(torch.from_numpy(txt))
    j_txt = oct.encode_text(params, cfg, txt.astype(np.int32))
    np.testing.assert_allclose(np.asarray(j_txt), t_txt.numpy(), atol=5e-5)
