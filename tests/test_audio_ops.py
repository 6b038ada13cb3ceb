"""Audio DSP parity: mel filterbank vs the reference's librosa-generated table, and
whisper log-mel vs the reference's torch implementation."""

import numpy as np
import pytest
import jax.numpy as jnp

from open_clip_tpu.ops.audio import (
    hz_to_mel,
    log_mel_clap,
    log_mel_whisper,
    mel_filter_bank,
    mel_to_hz,
    stft_magnitude,
)


def test_mel_filterbank_matches_reference_npz():
    """The reference ships librosa.filters.mel(sr=16000, n_fft=400, n_mels=80) as data
    (audio/mel_filters.npz); our construction must reproduce it."""
    with np.load("/root/reference/src/open_clip/audio/mel_filters.npz") as f:
        ref = f["mel_80"]
    ours = mel_filter_bank(16000, 400, 80, htk=True)
    np.testing.assert_allclose(ours, ref, atol=2e-7)


def test_mel_hz_roundtrip():
    f = np.array([0.0, 440.0, 1000.0, 8000.0, 22050.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-6)
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f, htk=True), htk=True), f, rtol=1e-6)


def test_stft_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    audio = rng.standard_normal(16000).astype(np.float32)
    ours = np.asarray(stft_magnitude(jnp.asarray(audio), n_fft=400, hop_length=160, power=2.0))
    t = torch.stft(
        torch.from_numpy(audio), 400, 160, window=torch.hann_window(400), return_complex=True
    )
    theirs = (t.abs() ** 2).numpy().T  # torch gives (freq, frames)
    np.testing.assert_allclose(ours, theirs, atol=1e-2, rtol=1e-4)


def test_whisper_logmel_matches_reference():
    from .reference_stubs import install_reference

    install_reference()
    from open_clip.audio.whisper import log_mel_spectrogram

    rng = np.random.default_rng(1)
    audio = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    theirs = log_mel_spectrogram(audio).numpy()
    ours = np.asarray(log_mel_whisper(jnp.asarray(audio)))
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_clap_logmel_tone_peak():
    """A pure tone must peak at the right mel bin."""
    sr, f0 = 48000, 1000.0
    t = np.arange(sr) / sr
    audio = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    mel = np.asarray(log_mel_clap(jnp.asarray(audio)))
    assert mel.shape[-1] == 64
    peak_bin = mel.mean(axis=0).argmax()
    # expected bin: where 1000 Hz falls among 64 slaney-mel bins between 50 and 14000 Hz
    centers = mel_to_hz(np.linspace(hz_to_mel(50), hz_to_mel(14000), 66))[1:-1]
    expected = np.abs(centers - f0).argmin()
    assert abs(int(peak_bin) - int(expected)) <= 1
