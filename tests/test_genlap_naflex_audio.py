"""GenLAP parity vs the torch reference + NaFlex audio patchify/encoder tests."""

import numpy as np
import pytest
import torch

import open_clip_tpu as oct
from open_clip_tpu.config import get_model_config, parse_model_cfg
from open_clip_tpu.data.naflex_audio import (
    AudioNaFlexPatchify,
    mel_to_patches,
    naflex_audio_eval_seq_len,
)
from open_clip_tpu.models import genlap as GL
from open_clip_tpu.models.genlap import AudioNaFlexCfg

from .reference_stubs import install_reference

import jax
import jax.numpy as jnp


def test_mel_to_patches_contract():
    mel = np.random.default_rng(0).standard_normal((30, 64)).astype(np.float32)
    out = mel_to_patches(mel, patch_freq=64, patch_time=4)
    assert out["patches"].shape == (8, 64 * 4)  # ceil(30/4)=8 time patches, F=1
    assert (out["patch_coord"][:, 0] == 0).all()  # full-height strips: freq idx 0
    np.testing.assert_array_equal(out["patch_coord"][:, 1], np.arange(8))
    out2 = mel_to_patches(mel, patch_freq=16, patch_time=4)
    assert out2["patches"].shape == (4 * 8, 16 * 4)


def test_mel_to_patches_matches_reference():
    install_reference()
    from open_clip.audio.naflex_audio import mel_to_patches as ref_mtp

    mel = np.random.default_rng(1).standard_normal((29, 64)).astype(np.float32)
    for pf, pm in ((64, "floor"), (16, "silence"), (64, "repeat")):
        ours = mel_to_patches(mel, patch_freq=pf, patch_time=4, pad_mode=pm)
        theirs = ref_mtp(torch.from_numpy(mel), pf, 4, pad_mode=pm)
        np.testing.assert_allclose(ours["patches"], theirs["patches"].numpy(), atol=1e-6)
        np.testing.assert_array_equal(ours["patch_coord"], theirs["patch_coord"].numpy())


def test_eval_seq_len():
    cfg = AudioNaFlexCfg()
    n = naflex_audio_eval_seq_len(cfg, seconds=10.0)
    # 10 s @48k, hop 480 -> 1001 frames -> ceil(1001/4) = 251 time patches (F=1)
    assert n == 251


@pytest.fixture(scope="module")
def genlap_pair():
    ref = install_reference()
    torch.manual_seed(44)
    tmodel = ref.create_model("naflexgenlap_test_1d")
    tmodel.eval()
    cfg = GL.GenLapModelCfg.from_dict(get_model_config("naflexgenlap_test_1d"))
    params = GL.torch_genlap_to_params(tmodel.state_dict(), cfg)
    return tmodel, cfg, params


def _audio_batch(seed=0, b=2, n=10, lt=8, pad=100278):
    rng = np.random.default_rng(seed)
    pdim = 64 * 4
    patches = rng.standard_normal((b, n, pdim)).astype(np.float32)
    coords = np.stack([np.zeros(n, np.int32), np.arange(n, dtype=np.int32)], -1)[None].repeat(b, 0)
    valid = np.ones((b, n), dtype=bool)
    valid[1, 7:] = False
    text = rng.integers(0, 1000, size=(b, lt)).astype(np.int64)
    text[0, 5:] = pad
    return {"patches": patches, "patch_coord": coords, "patch_valid": valid}, text


def test_genlap_encode_audio_parity(genlap_pair):
    tmodel, cfg, params = genlap_pair
    audio, _ = _audio_batch()
    taudio = {k: torch.from_numpy(np.asarray(v)) for k, v in audio.items()}
    with torch.no_grad():
        t_feat = tmodel.encode_audio(taudio, normalize=True)
    j_feat = GL.encode_audio(params, cfg, {k: jnp.asarray(v) for k, v in audio.items()}, normalize=True)
    np.testing.assert_allclose(np.asarray(j_feat), t_feat.numpy(), atol=5e-5)


def test_genlap_loss_parity(genlap_pair):
    tmodel, cfg, params = genlap_pair
    audio, text = _audio_batch(1)
    taudio = {k: torch.from_numpy(np.asarray(v)) for k, v in audio.items()}
    with torch.no_grad():
        t_out = tmodel(taudio, torch.from_numpy(text), compute_loss=True)
    j_out = GL.genlap_forward(
        params, cfg, {k: jnp.asarray(v) for k, v in audio.items()},
        jnp.asarray(text.astype(np.int32)), compute_loss=True,
    )
    np.testing.assert_allclose(float(j_out["loss"]), float(t_out["loss"]), rtol=1e-5)


def test_genlap_factory():
    model = oct.create_model("naflexgenlap_test_1d")
    audio, text = _audio_batch(2)
    out = model(audio, text.astype(np.int32), compute_loss=True)
    assert np.isfinite(float(out["loss"]))


def test_naflex_audio_clap_encoder():
    """NaFlexClap (model_type=naflexvit) end-to-end through the CLAP container."""
    name = "tiny-naflexclap"
    if name not in oct.list_models():
        oct.add_model_config(
            {
                "embed_dim": 32,
                "audio_cfg": {
                    "model_type": "naflexvit", "sample_rate": 48000, "mel_bins": 64,
                    "window_size": 1024, "hop_size": 480, "patch_freq": 64, "patch_time": 4,
                    "naflexvit_cfg": {"embed_dim": 48, "depth": 2, "num_heads": 4},
                },
                "text_cfg": {"context_length": 12, "vocab_size": 64, "width": 32, "heads": 2, "layers": 2},
            },
            name=name,
        )
    model = oct.create_model(name)
    patchify = AudioNaFlexPatchify(AudioNaFlexCfg(), max_audio_tokens=32)
    rng = np.random.default_rng(3)
    wavs = [(rng.standard_normal(48000) * 0.1).astype(np.float32) for _ in range(2)]
    dicts = [patchify((w, 48000)) for w in wavs]
    batch = {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}
    feats = model.encode_audio(batch, normalize=True)
    assert feats.shape == (2, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)
