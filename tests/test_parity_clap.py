"""CLAP parity vs the torch reference: Whisper encoder (torch-runnable directly) and
HTSAT Swin encoder (reference run with functional torchlibrosa stubs sharing our
validated mel frontend)."""

import json

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.checkpoint import merge_params
from open_clip_tpu.config import parse_model_cfg
from open_clip_tpu.models import clap as clap_mod
from open_clip_tpu.models.clip import init_clip

from .reference_stubs import install_reference

import jax
import jax.numpy as jnp

TINY_TEXT = {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2}

CLAP_WHISPER = {
    "embed_dim": 32,
    "audio_cfg": {
        "model_type": "whisper", "model_name": "tiny", "sample_rate": 16000,
        "mel_bins": 80, "window_size": 400, "hop_size": 160, "fmin": 50, "fmax": 8000,
        "clip_samples": 480000, "audio_length": 1024,
    },
    "text_cfg": TINY_TEXT,
}

CLAP_HTSAT = {
    "embed_dim": 32,
    "audio_cfg": {
        "model_type": "HTSAT", "model_name": "tiny", "sample_rate": 48000,
        "mel_bins": 64, "window_size": 1024, "hop_size": 480, "fmin": 50, "fmax": 14000,
        "clip_samples": 480000, "audio_length": 1024,
    },
    "text_cfg": TINY_TEXT,
}


@pytest.fixture(scope="module")
def ref():
    return install_reference()


def _register(ref, tmp_path_factory, name, cfg):
    if name not in oct.list_models():
        oct.add_model_config(dict(cfg), name=name)
    if name not in ref.list_models():
        p = tmp_path_factory.mktemp("cfg") / f"{name}.json"
        p.write_text(json.dumps(cfg))
        ref.add_model_config(p)
    return name


def _pair(ref, tmp_path_factory, name, cfg_dict, seed):
    name = _register(ref, tmp_path_factory, name, cfg_dict)
    torch.manual_seed(seed)
    tmodel = ref.create_model(name)
    tmodel.eval()
    cfg = parse_model_cfg(name)
    params = clap_mod.torch_clap_to_params(tmodel.state_dict(), cfg)
    return tmodel, cfg, params


def test_clap_whisper_parity(ref, tmp_path_factory):
    tmodel, cfg, params = _pair(ref, tmp_path_factory, "tiny-clap-whisper", CLAP_WHISPER, 5)
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, 32000)) * 0.1).astype(np.float32)
    txt = rng.integers(1, 63, size=(2, 12)).astype(np.int64)

    with torch.no_grad():
        t_audio = tmodel.encode_audio({"waveform": torch.from_numpy(wav)}, normalize=True)
        t_text = tmodel.encode_text(torch.from_numpy(txt), normalize=True)
    j_out = oct.clip_forward(params, cfg, {"waveform": jnp.asarray(wav)}, txt.astype(np.int32))
    np.testing.assert_allclose(np.asarray(j_out["audio_features"]), t_audio.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(j_out["text_features"]), t_text.numpy(), atol=5e-5)


def test_clap_htsat_parity(ref, tmp_path_factory):
    tmodel, cfg, params = _pair(ref, tmp_path_factory, "tiny-clap-htsat", CLAP_HTSAT, 6)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, 480000)) * 0.1).astype(np.float32)

    with torch.no_grad():
        t_audio = tmodel.encode_audio({"waveform": torch.from_numpy(wav)}, normalize=True)
    j_audio = clap_mod.encode_audio(params, cfg, {"waveform": jnp.asarray(wav)}, normalize=True)
    a, b = np.asarray(j_audio), t_audio.numpy()
    cos = (a * b).sum(-1) / np.linalg.norm(a, axis=-1) / np.linalg.norm(b, axis=-1)
    assert cos.min() > 1 - 1e-4, cos
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_clap_factory_and_logits():
    model = oct.create_model("tiny-clap-htsat")
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, 480000)) * 0.1).astype(np.float32)
    feats = model.encode_audio({"waveform": wav}, normalize=True)
    assert feats.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)
