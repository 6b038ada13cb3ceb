"""NaFlex audio host-side patchify (numpy).

Equivalent of reference ``src/open_clip/audio/naflex_audio.py:103-304``: log-mel ->
variable-length ``(freq, time)`` patch tokens in the image-NaFlex dict contract, so
the whole NaFlex batching stack (scheduler, bucketer, collate) serves audio unchanged.
The mel here runs on the host in numpy (data workers); the on-device jax mel
(ops/audio.log_mel_clap) computes the identical values for in-graph use.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models.genlap import AudioNaFlexCfg
from ..ops.audio import mel_filter_bank

MEL_SILENCE_DB = -100.0


def _np_log_mel(wav: np.ndarray, cfg: AudioNaFlexCfg) -> np.ndarray:
    """(T,) waveform -> (frames, n_mels) dB-mel — numpy mirror of ops/audio.log_mel_clap."""
    n_fft, hop = cfg.window_size, cfg.hop_size
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    pad = n_fft // 2
    x = np.pad(wav.astype(np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = x[idx] * window
    mag2 = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
    filters = mel_filter_bank(cfg.sample_rate, n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    mel = mag2 @ filters.T
    return 10.0 * np.log10(np.maximum(mel, 1e-10)).astype(np.float32)


def mel_to_patches(
    mel: np.ndarray,  # (T, n_mels) or (C, T, n_mels)
    patch_freq: int,
    patch_time: int,
    in_chans: int = 1,
    pad_mode: str = "floor",
) -> Dict[str, np.ndarray]:
    """Patchify one log-mel into the NaFlex dict (reference mel_to_patches, :132-190).
    Time rounds UP to whole patches; final-patch fill by floor/silence/repeat."""
    if mel.ndim == 2:
        mel = mel[None]
    c, t, n_mels = mel.shape
    assert c == in_chans and n_mels % patch_freq == 0
    f = n_mels // patch_freq
    tt = max(1, math.ceil(t / patch_time))
    pad_frames = tt * patch_time - t
    if pad_frames > 0:
        if pad_mode == "repeat" and t > 0:
            tail = np.broadcast_to(mel[:, -1:, :], (c, pad_frames, n_mels))
        else:
            if pad_mode == "floor" and t > 0:
                fill = float(mel.min())
            else:  # silence, or empty clip
                fill = MEL_SILENCE_DB
            tail = np.full((c, pad_frames, n_mels), fill, dtype=mel.dtype)
        mel = np.concatenate([mel, tail], axis=1)

    mel = mel.reshape(c, tt, patch_time, f, patch_freq)
    mel = mel.transpose(3, 1, 0, 4, 2)  # (F, Tt, C, p_f, p_t) — canonical flatten order
    patches = np.ascontiguousarray(mel).reshape(f * tt, c * patch_freq * patch_time)

    freq_idx = np.repeat(np.arange(f), tt)
    time_idx = np.tile(np.arange(tt), f)
    return {
        "patches": patches.astype(np.float32),
        "patch_coord": np.stack([freq_idx, time_idx], axis=1).astype(np.int32),
        "patch_valid": np.ones(f * tt, dtype=bool),
    }


class AudioNaFlexPatchify:
    """(waveform, sample_rate) -> padded patch dict (reference AudioNaFlexPatchify,
    :219-271). ``max_audio_tokens`` caps by whole time columns; output is padded to
    ``max_audio_tokens`` for static XLA shapes."""

    def __init__(self, cfg: AudioNaFlexCfg, max_audio_tokens: Optional[int] = None):
        if max_audio_tokens is not None and max_audio_tokens < cfg.freq_tokens:
            raise ValueError(
                f"max_audio_tokens={max_audio_tokens} < freq_tokens={cfg.freq_tokens}"
            )
        self.cfg = cfg
        self.max_audio_tokens = max_audio_tokens

    def __call__(self, audio_data: Tuple[np.ndarray, int]) -> Dict[str, np.ndarray]:
        wav, sr = audio_data
        wav = np.asarray(wav, dtype=np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=0)
        if sr != self.cfg.sample_rate:
            wav = resample_poly(wav, sr, self.cfg.sample_rate)
        if wav.shape[-1] < self.cfg.window_size:
            wav = np.pad(wav, (0, self.cfg.window_size - wav.shape[-1]))
        mel = _np_log_mel(wav, self.cfg)

        if self.max_audio_tokens is not None:
            max_time = max(1, self.max_audio_tokens // self.cfg.freq_tokens)
            max_frames = max_time * self.cfg.patch_time
            mel = mel[:max_frames]

        out = mel_to_patches(
            mel, self.cfg.patch_freq, self.cfg.patch_time, self.cfg.in_chans,
            pad_mode=self.cfg.patch_pad_mode,
        )
        if self.max_audio_tokens is not None:
            out = pad_patch_dict(out, self.max_audio_tokens)
        return out


def pad_patch_dict(d: Dict[str, np.ndarray], n: int) -> Dict[str, np.ndarray]:
    cur = d["patches"].shape[0]
    if cur >= n:
        return {k: v[:n] for k, v in d.items()}
    pad = n - cur
    return {
        "patches": np.concatenate([d["patches"], np.zeros((pad, d["patches"].shape[1]), np.float32)]),
        "patch_coord": np.concatenate([d["patch_coord"], np.zeros((pad, 2), np.int32)]),
        "patch_valid": np.concatenate([d["patch_valid"], np.zeros(pad, bool)]),
    }


def resample_poly(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Linear-interpolation resample (host preprocessing; torchaudio-free)."""
    if sr_in == sr_out:
        return wav
    n_out = int(round(len(wav) * sr_out / sr_in))
    x_out = np.arange(n_out) * (sr_in / sr_out)
    return np.interp(x_out, np.arange(len(wav)), wav).astype(np.float32)


def naflex_audio_eval_seq_len(cfg: AudioNaFlexCfg, seconds: float = 10.0) -> int:
    """Exact audio-token count for ``seconds`` of audio (reference :293-304)."""
    t = AudioNaFlexPatchify(cfg)
    d = t((np.zeros(int(round(seconds * cfg.sample_rate)), np.float32), cfg.sample_rate))
    return int(d["patches"].shape[0])
