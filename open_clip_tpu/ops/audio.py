"""Audio DSP ops in JAX/numpy: STFT, mel filterbanks, log-mel spectrograms.

TPU-native replacement for the reference's torchlibrosa/torchaudio frontends
(reference ``src/open_clip/audio/htsat.py`` Spectrogram/LogmelFilterBank usage and
``src/open_clip/audio/whisper.py:69-110`` log_mel_spectrogram): the whole
waveform->log-mel path is jittable jnp (framing + rfft + one matmul), so it fuses
into the encoder forward on device instead of running on the host.

Mel filterbank construction reimplements the librosa conventions (slaney mel scale +
slaney area normalization by default, HTK option) so filter values match the
reference's shipped librosa-generated tables.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# mel scale / filterbank (librosa conventions, numpy — built once at trace time)
# ---------------------------------------------------------------------------

def hz_to_mel(f, htk: bool = False):
    f = np.asanyarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def mel_to_hz(m, htk: bool = False):
    m = np.asanyarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=16)
def mel_filter_bank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filterbank — librosa.filters.mel semantics."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)

    mel_min, mel_max = hz_to_mel(fmin, htk), hz_to_mel(fmax, htk)
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]  # (n_mels+2, n_freqs)
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT (jittable)
# ---------------------------------------------------------------------------

def _hann_window(n_fft: int, win_length: int) -> np.ndarray:
    """Periodic Hann of ``win_length``, zero-padded centered to ``n_fft``."""
    window = np.hanning(win_length + 1)[:-1].astype(np.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    return window


@functools.lru_cache(maxsize=16)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """(n_fft, 2 * n_bins) windowed real-DFT basis: [cos | -sin] columns, so
    ``frames @ basis`` yields [Re(rfft(frames * window)) | Im(...)].

    The DFT runs as ONE MXU matmul instead of XLA's FFT decomposition: on TPU
    the FFT lowers to a chain of f32 stage ops plus a gather-built frame tensor
    (measured ~80 ms/step of the CLAP train step at batch 128); the matmul
    form is a single dense op the MXU runs at near-peak, and the frame tensor
    is built from hop-strided reshape slices (plain copies, no gather).
    """
    n_bins = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    window = _hann_window(n_fft, win_length)[:, None].astype(np.float64)
    basis = np.concatenate([np.cos(ang) * window, -np.sin(ang) * window], axis=1)
    return basis.astype(np.float32)


def frame_signal(x: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(..., T) -> (..., n_frames, n_fft) overlapping frames WITHOUT a gather:
    the signal reshapes into hop-sized rows and each frame is the concat of
    ``ceil(n_fft / hop)`` consecutive rows — r cheap strided slices + one concat,
    which XLA emits as full-bandwidth copies (the index-array gather formulation
    ran at ~1/40 of HBM bandwidth in the CLAP train-step trace)."""
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    r = -(-n_fft // hop_length)
    rows = n_frames + r - 1
    pad = rows * hop_length - t
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    z = x[..., : rows * hop_length].reshape(*x.shape[:-1], rows, hop_length)
    parts = [z[..., j : j + n_frames, :] for j in range(r)]
    return jnp.concatenate(parts, axis=-1)[..., :n_fft]


def stft_magnitude(
    audio: jax.Array,  # (..., T)
    n_fft: int,
    hop_length: int,
    win_length: Optional[int] = None,
    center: bool = True,
    power: float = 2.0,
    pad_mode: str = "reflect",
) -> jax.Array:
    """|STFT|^power with a periodic Hann window — torch.stft conventions.
    Returns (..., n_frames, n_fft//2 + 1).

    TPU formulation: hop-strided reshape framing + one windowed-DFT matmul on
    the MXU (see ``_dft_basis``) instead of gather + ``jnp.fft.rfft``. The
    matmul runs at HIGHEST precision (f32-equivalent on TPU) — the power
    spectrogram squares any error, and downstream log-mel parity is 1e-4."""
    win_length = win_length or n_fft
    x = audio.astype(jnp.float32)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=pad_mode)

    frames = frame_signal(x, n_fft, hop_length)  # (..., n_frames, n_fft)
    basis = jnp.asarray(_dft_basis(n_fft, win_length))
    spec = jax.lax.dot_general(
        frames, basis, (((frames.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )  # (..., n_frames, 2 * n_bins)
    n_bins = n_fft // 2 + 1
    mag2 = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    if power == 2.0:
        return mag2
    mag = jnp.sqrt(jnp.maximum(mag2, 0.0))
    return mag if power == 1.0 else mag ** power


def log_mel_whisper(audio: jax.Array, n_mels: int = 80) -> jax.Array:
    """Whisper log-mel (reference whisper.py:69-110): 16 kHz, n_fft 400, hop 160,
    drop the last STFT frame, log10 clamp, dynamic-range compress to ~[-1, 1].
    Returns (..., n_mels, n_frames)."""
    mag2 = stft_magnitude(audio, n_fft=400, hop_length=160, center=True, power=2.0)
    mag2 = mag2[..., :-1, :]  # torch.stft keeps a trailing frame whisper drops
    # the reference's shipped table is htk-scale + slaney-normalized (verified vs npz)
    filters = jnp.asarray(mel_filter_bank(16000, 400, n_mels, htk=True))  # (n_mels, n_freq)
    mel = jnp.einsum("mf,...tf->...mt", filters, mag2)
    log_spec = jnp.log10(jnp.clip(mel, min=1e-10))
    log_spec = jnp.maximum(log_spec, log_spec.max(axis=(-2, -1), keepdims=True) - 8.0)
    return (log_spec + 4.0) / 4.0


def log_mel_clap(
    audio: jax.Array,  # (..., T)
    sample_rate: int = 48000,
    n_fft: int = 1024,
    hop_length: int = 480,
    n_mels: int = 64,
    fmin: float = 50,
    fmax: float = 14000,
    ref: float = 1.0,
    amin: float = 1e-10,
    top_db: Optional[float] = None,
) -> jax.Array:
    """CLAP/HTSAT log-mel (torchlibrosa Spectrogram+LogmelFilterBank semantics:
    power spectrogram, librosa slaney mel, 10*log10 power->db).
    Returns (..., n_frames, n_mels)."""
    mag2 = stft_magnitude(audio, n_fft=n_fft, hop_length=hop_length, center=True, power=2.0)
    filters = jnp.asarray(mel_filter_bank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("...tf,mf->...tm", mag2, filters)
    db = 10.0 * jnp.log10(jnp.clip(mel, min=amin))
    db = db - 10.0 * jnp.log10(jnp.maximum(amin, ref))
    if top_db is not None:
        db = jnp.maximum(db, db.max(axis=(-2, -1), keepdims=True) - top_db)
    return db
